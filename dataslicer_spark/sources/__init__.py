"""Sources & sinks: parquet write-through cache, FITS reader plumbing,
external-catalog fetch-then-broadcast, multimodal binary assets."""
