"""mapreduce_parity queries (filled in incrementally)."""
