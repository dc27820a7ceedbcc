"""Sources and sinks: partitioned Parquet triple store with per-partition
lineage sidecars, and resumable chunked execution over input shards."""
