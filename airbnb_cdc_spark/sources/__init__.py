"""Sources/sinks: CSV customer feed, JSON booking change feed, parquet tables."""
