"""map_batches stage functions & actor classes."""
