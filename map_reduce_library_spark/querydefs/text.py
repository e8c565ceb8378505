"""text queries (filled in incrementally)."""
