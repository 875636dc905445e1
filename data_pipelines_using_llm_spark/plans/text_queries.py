"""Text-analysis query pack — filled by operators/text.py (task 7)."""

QUERIES: dict = {}
