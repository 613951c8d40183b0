"""Host-side and jittable utilities: masks, text/tokenizers, checkpoint ingestion."""
