"""Sources and sinks: CSV stage reader, parquet warehouse, JDBC source."""
