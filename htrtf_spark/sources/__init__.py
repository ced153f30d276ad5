"""Table sources: parquet now; Iceberg behind an import/classpath gate."""
