from hiveberg_spark.sources.snapshot_table import SnapshotTable, resolve_table

__all__ = ["SnapshotTable", "resolve_table"]
