"""Operator library: word count, relational corpus, dedup, similarity,
text analysis, multimodal plumbing."""
