"""Sources/sinks: parquet (primary), Iceberg when a runtime jar is present,
and derived canonical tables (transcripts/context from the driver's events
table, computed identically in Spark and ANSI SQL for oracle parity)."""
