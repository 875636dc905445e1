"""Similarity-search query pack — filled by operators/similarity.py (task 6)."""

QUERIES: dict = {}
