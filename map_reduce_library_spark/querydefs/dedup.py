"""dedup queries (filled in incrementally)."""
