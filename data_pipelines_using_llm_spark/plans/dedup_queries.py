"""Deduplication query pack — filled by operators/dedup.py (task 5)."""

QUERIES: dict = {}
