"""Source/sink connectors (XML ingest, parquet table I/O)."""
