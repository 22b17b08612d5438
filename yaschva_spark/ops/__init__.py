"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. All scale-first: built-in Catalyst
expressions + hash-partitioned joins; Python only as vectorized pandas UDFs
where expressions genuinely can't express the op (simhash bit-voting,
multimodal decode)."""
