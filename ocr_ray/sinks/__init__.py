"""Output sinks: resumable partitioned parquet + export-format columns."""
