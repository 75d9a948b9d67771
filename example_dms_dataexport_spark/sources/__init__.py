"""Sources and sinks: CSV/parquet/ORC/XML/Avro stage readers, parquet
warehouse, JDBC source, JSONL shard export, WebDataset tar-shard
export/ingest."""
