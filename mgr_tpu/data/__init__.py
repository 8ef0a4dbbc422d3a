"""Data pipeline: on-disk contracts, batching, vocab, synthetic fixtures."""
