"""Sources/sinks: parquet-or-Iceberg checkpoint tables + lineage metrics."""
