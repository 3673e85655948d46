"""Training-data pipeline operators: deduplication, similarity search, text
analysis, multimodal plumbing — the operations a 100TB corpus pipeline needs on
top of the reference's dataflow surface."""
