"""similarity queries (filled in incrementally)."""
