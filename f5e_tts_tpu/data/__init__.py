"""Data pipeline: Arrow datasets, frame-packed batching, static-shape collation."""
