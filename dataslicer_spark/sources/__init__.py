"""Sources & sinks: parquet write-through cache, FITS reader plumbing +
the ``format("fits")`` Python DataSource, partitioned-lake layout,
external-catalog fetch-then-broadcast, multimodal binary assets."""
