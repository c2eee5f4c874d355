"""Sources & sinks: landed-payload ingestion (the engine-side half of the
reference's HTTP polling) and partitioned parquet append sinks."""
