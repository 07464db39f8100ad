"""Sources/sinks: snapshot-versioned table storage (Iceberg when the
runtime jar is available, manifest-versioned parquet otherwise)."""
