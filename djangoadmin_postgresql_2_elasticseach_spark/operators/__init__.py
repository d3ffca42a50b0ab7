"""Operators: denormalization, API-layer queries, pagination, dedup,
similarity search, and text analysis — all pure DataFrame transforms."""
