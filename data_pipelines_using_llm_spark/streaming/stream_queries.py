"""Structured-Streaming query pack — filled by streaming/ingest.py (task 8)."""

QUERIES: dict = {}
