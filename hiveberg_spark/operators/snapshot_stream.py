"""Streaming read of a snapshot table [N]: the Iceberg capability of
subscribing to a table's appends as an unbounded stream (Iceberg's
Spark streaming read / `stream-from-timestamp`), expressed through
Spark's file streaming source over the table's data layout.

The file source discovers each commit's data files as they land (here:
the whole backlog in one availableNow batch); at scale the same
pipeline runs unbounded — each `append()` drops new files into
`data/<commit-uuid>/` and the running stream picks them up on the next
trigger. Valid for append-only tables: row-level ops (delete/update/
merge) rewrite files, which a file-level subscription would re-read —
the same reason Iceberg's streaming read rejects non-append snapshots
(and scan_changes refuses replace ranges, snapshot_table.py).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hiveberg_spark.operators.timetravel import _ensure_fixture
from hiveberg_spark.registry import query
from hiveberg_spark.streaming.events import run_to_memory


@query(
    "stream_snapshot_table_source",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def stream_snapshot_table_source(spark, sf_dir):
    """Subscribe to the 3-append nation_versions table as a stream and
    aggregate per region: every committed file is delivered exactly once
    (file-source tracking), so the streaming aggregate over the full
    backlog equals the batch GROUP BY over the final table contents."""
    t = _ensure_fixture(spark, sf_dir)  # append-only by construction
    # the file-source subscription globs *.parquet: valid because this
    # table is parquet-only; a mixed-format table (round-4
    # set_file_format) would need one stream per format union'd — guard
    # so the miss could never be silent
    non_parquet = [f for f in t.plan_files() if not f.endswith(".parquet")]
    if non_parquet:  # a real error, never an assert: must survive -O
        raise ValueError(
            "snapshot streaming source requires a parquet-only table; "
            f"found non-parquet data files: {non_parquet[:5]}"
        )
    # merge-on-read delete files remove rows WITHOUT touching data
    # files, which a file-level subscription cannot see — refuse, like
    # the append-only checks above (Iceberg's streaming read likewise
    # rejects delete snapshots)
    _meta = t._read_meta()
    if t._raw_deletes_as_of(_meta, _meta["current_snapshot_id"]):
        raise ValueError(
            "snapshot streaming source requires an append-only table; "
            "this table has live merge-on-read delete files"
        )
    schema = t.schema()
    raw = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .format("parquet")
        .load(os.path.join(t.location, "data"))
    )
    agg = raw.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )
    return run_to_memory(
        agg, output_mode="complete", name="snapshot_table_source"
    )
