"""Inference orchestration: text chunking, duration estimation, bucketing,
cross-fade stitching, CLI."""
