"""Driver-checkable query for the `hiveberg` Python Data Source facade
(sources/pyds.py): the same snapshot-table semantics the engine scan
is oracled on, read through `spark.read.format("hiveberg")` instead —
proving the DSv2 surface end-to-end (plan → partitions → executor
Arrow read) against DuckDB.

Reference contract: main/IcebergStorageHandler.java:21-38 (the
reference's pluggable-source exposure, re-expressed as Spark's)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hiveberg_spark.registry import query


@query(
    "pyds_facade_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           CAST(SUM(7) AS BIGINT) AS sum_default,
           CAST(COUNT(name) AS BIGINT) AS n_named
    FROM (SELECT s_suppkey, s_name AS name FROM supplier
          WHERE s_suppkey >= 2)
    """,
)
def pyds_facade_scan(spark, sf_dir):
    """Read a snapshot table through the Python Data Source facade
    after it has been through a merge-on-read DELETE, a column rename,
    and an add-column-with-default — the three evolution shapes whose
    per-file read specs the facade resolves at plan time. The oracle
    recomputes the aggregate from the raw supplier rows: s_suppkey<2
    deleted (MOR), s_name visible under its renamed name, and every
    surviving row reading the initial default 7 (all data files
    predate the add)."""
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.sources.snapshot_table import build_once

    loc = os.path.join(warehouse_dir(sf_dir), "supplier_pyds_facade")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )

    def builder(t):
        k = F.col("s_suppkey")
        t.append(supplier.filter(k < 6).coalesce(1))
        t.append(supplier.filter(k >= 6).coalesce(1))
        t.delete_where("s_suppkey < 2", mode="merge-on-read")
        t.rename_column("s_name", "name")
        t.add_column("score", "int", default_sql="7")

    with _lock:
        build_once(spark, loc, builder)
    pyds.register(spark)
    df = (
        spark.read.format("hiveberg")
        .option("virtual_column", "")
        .load(loc)
    )
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("s_suppkey").cast("long").alias("sum_key"),
        F.sum("score").cast("long").alias("sum_default"),
        F.count("name").cast("long").alias("n_named"),
    )


@query(
    "pyds_lineage_scan",
    oracle="""
    SELECT s_suppkey,
           CAST(ROW_NUMBER() OVER (ORDER BY (s_suppkey >= 6), s_suppkey)
                - 1 AS BIGINT) AS _row_id,
           CAST(CASE WHEN s_suppkey < 6 THEN 1 ELSE 2 END AS BIGINT)
               AS _last_updated_sequence_number
    FROM supplier
    QUALIFY s_suppkey <> 3
    """,
)
def pyds_lineage_scan(spark, sf_dir):
    """Iceberg v3 row lineage through the facade:
    `.option("row_lineage", "true")` after a COW delete AND a
    compaction — both rewrites must PRESERVE each surviving row's
    `_row_id` and `_last_updated_sequence_number` (the v3 writers-
    should-preserve contract). The oracle reconstructs the lineage
    from the deterministic build: append 1 writes s_suppkey<6 sorted
    (row-id block 0.., seq 1), append 2 the rest (block n1.., seq 2);
    the delete and compaction change NEITHER column for survivors, so
    row ids are the pre-delete global rank and the seq is the adding
    commit's."""
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.sources.snapshot_table import build_once

    loc = os.path.join(warehouse_dir(sf_dir), "supplier_pyds_lineage")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    k = F.col("s_suppkey")

    def builder(t):
        t.append(
            supplier.filter(k < 6).coalesce(1).sortWithinPartitions(k)
        )
        t.append(
            supplier.filter(k >= 6).coalesce(1).sortWithinPartitions(k)
        )
        t.delete_where("s_suppkey = 3", mode="copy-on-write")
        t.compact()

    with _lock:
        build_once(spark, loc, builder)
    pyds.register(spark)
    return (
        spark.read.format("hiveberg")
        .option("row_lineage", "true")
        .load(loc)
    )


@query(
    "pyds_facade_write",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           CAST(SUM(3) AS BIGINT) AS sum_score,
           CAST(3 AS BIGINT) AS n_commits
    FROM supplier WHERE s_suppkey < 4
    """,
)
def pyds_facade_write(spark, sf_dir):
    """The facade WRITE path end-to-end:
    `df.write.format("hiveberg")` appends supplier in two halves (the
    missing defaulted `score` column bakes its write default 3
    physically), then `mode("overwrite")` replaces the contents with
    the s_suppkey<4 slice — three commits through the executor-staged
    write protocol (_commit_register). The result reads BACK through
    the facade read and the oracle recomputes the final aggregate from
    raw supplier; n_commits pins that all three snapshots landed."""
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.sources.snapshot_table import build_once

    loc = os.path.join(warehouse_dir(sf_dir), "supplier_pyds_write")
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), F.col("s_name").alias("name")
    )
    pyds.register(spark)
    k = F.col("s_suppkey")

    def builder(t):
        t.add_column("score", "int", default_sql="3")

        def put(df, mode):
            df.write.format("hiveberg").mode(mode).save(t.location)

        put(supplier.filter(k < 6), "append")
        put(supplier.filter(k >= 6), "append")
        put(supplier.filter(k < 4), "overwrite")

    with _lock:
        t = build_once(
            spark, loc, builder, schema="s_suppkey long, name string"
        )
    df = (
        spark.read.format("hiveberg")
        .option("virtual_column", "")
        .load(t.location)
    )
    n_commits = t.snapshots().count()
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("s_suppkey").cast("long").alias("sum_key"),
        F.sum("score").cast("long").alias("sum_score"),
        F.lit(n_commits).cast("long").alias("n_commits"),
    )


@query(
    "pyds_partitioned_write",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM supplier) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey = 5)
                AS BIGINT) AS n_probe,
           TRUE AS pruned
    """,
)
def pyds_partitioned_write(spark, sf_dir):
    """Hidden-partitioned facade WRITE + bucket pruning end to end:
    `df.write.format("hiveberg")` fans supplier out into
    bucket(s_suppkey, 4) partition dirs executor-side (vectorized
    XXH64 transform), and a point probe then plans STRICTLY fewer
    files than the full scan — proving the facade-written manifests
    carry engine-equivalent partition values. The oracle recomputes
    both counts from raw supplier; `pruned` pins the file-skip (the
    bucket layout is deterministic for the fixed fixture data)."""
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.sources.snapshot_table import build_once

    loc = os.path.join(warehouse_dir(sf_dir), "supplier_pyds_pwrite")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    pyds.register(spark)

    def builder(t):
        supplier.coalesce(1).write.format("hiveberg").mode("append").save(
            t.location
        )

    with _lock:
        t = build_once(
            spark,
            loc,
            builder,
            schema="s_suppkey long, s_name string",
            partition_spec=[("bucket", "s_suppkey", 4)],
        )
    pruned = len(t.plan_files(where="s_suppkey = 5")) < len(t.plan_files())
    return t.scan().agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("s_suppkey") == 5, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_probe"),
        F.lit(bool(pruned)).alias("pruned"),
    )


@query(
    "pyds_incremental_read",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(CASE WHEN n_nationkey <= 16 THEN 2 ELSE 3 END AS BIGINT)
               AS snapshot__id
    FROM nation WHERE n_nationkey >= 8
    """,
)
def pyds_incremental_read(spark, sf_dir):
    """Iceberg's INCREMENTAL batch read as facade options
    (`start_snapshot_id` exclusive / `end_snapshot_id`): only the
    files appended after commit 1 of the 3-commit nation fixture,
    each row stamped with its ADDING commit — the batch twin of the
    streaming read's offset contract. Oracle reconstructs the stamp
    from the fixture's deterministic key-range appends."""
    from hiveberg_spark.operators.timetravel import _ensure_fixture
    from hiveberg_spark.sources import pyds

    t = _ensure_fixture(spark, sf_dir)
    pyds.register(spark)
    return (
        spark.read.format("hiveberg")
        .option("start_snapshot_id", 1)
        .load(t.location)
        .select("n_nationkey", "n_name", "n_regionkey", "snapshot__id")
    )


@query(
    "stream_pyds_sink",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def stream_pyds_sink(spark, sf_dir):
    """The facade as a native STREAMING SINK:
    `writeStream.format("hiveberg")` consumes the 3-commit
    nation_versions fixture through the facade stream reader and lands
    each micro-batch as an exactly-once append snapshot (batch-id dedup
    in the snapshot summary). The oracle is raw nation — every row
    delivered exactly once through the read-stream -> write-stream
    loop."""
    import tempfile

    from hiveberg_spark.operators.timetravel import (
        _ensure_fixture,
        _lock,
        warehouse_dir,
    )
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.sources.snapshot_table import build_once

    src = _ensure_fixture(spark, sf_dir)
    pyds.register(spark)
    dst_loc = os.path.join(warehouse_dir(sf_dir), "nation_pyds_sink")
    sdf = (
        spark.readStream.format("hiveberg")
        .option("virtual_column", "")
        .load(src.location)
    )

    def builder(t):
        q = (
            sdf.writeStream.format("hiveberg")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="hb_sink_ck"))
            .trigger(availableNow=True)
            .start(t.location)
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("stream_pyds_sink did not drain in 180s")

    with _lock:
        t = build_once(spark, dst_loc, builder, schema=sdf.schema)
    return t.scan().select("n_nationkey", "n_name", "n_regionkey")


@query(
    "stream_pyds_source",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(CASE WHEN n_nationkey < 8 THEN 1
                     WHEN n_nationkey <= 16 THEN 2
                     ELSE 3 END AS BIGINT) AS snapshot__id
    FROM nation
    """,
)
def stream_pyds_source(spark, sf_dir):
    """Streaming read through the facade's DataSourceStreamReader:
    subscribe to the 3-append nation_versions fixture with snapshot
    ids as offsets. Every row arrives exactly once, stamped with the
    snapshot that COMMITTED it (the streaming virtual column) — the
    oracle reconstructs that stamp from the fixture's deterministic
    key-range appends (<8 -> commit 1, 8..16 -> commit 2, else 3)."""
    from hiveberg_spark.operators.timetravel import _ensure_fixture
    from hiveberg_spark.sources import pyds
    from hiveberg_spark.streaming.events import run_to_memory

    t = _ensure_fixture(spark, sf_dir)
    pyds.register(spark)
    sdf = spark.readStream.format("hiveberg").load(t.location)
    out = run_to_memory(sdf, output_mode="append", name="pyds_stream_src")
    return out.select("n_nationkey", "n_name", "n_regionkey", "snapshot__id")
