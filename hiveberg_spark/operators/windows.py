"""Window functions (SURVEY.md §2.5).

HiveQL windowing surface as Spark Window specs. Scale note: a window
partitioned by a key shuffles once on that key; an un-partitioned ORDER
BY window serializes onto one task — every query here partitions.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query

_DEC = "decimal(30,6)"


@query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER()   OVER w AS rn,
             RANK()         OVER w AS rnk,
             DENSE_RANK()   OVER w AS drnk,
             NTILE(4)       OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_ranking(spark, sf_dir):
    """row_number/rank/dense_rank/ntile + top-k-per-group (the scalable
    top-k: no global sort, one shuffle on the partition key)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           LAG(l_quantity)  OVER w AS prev_qty,
           LEAD(l_quantity) OVER w AS next_qty,
           FIRST_VALUE(l_quantity) OVER w AS first_qty,
           LAST_VALUE(l_quantity)  OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty
    FROM lineitem WHERE l_suppkey <= 3
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def window_analytic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w_full).alias("last_qty"),
    )


@query(
    "window_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
)
def window_running_agg(spark, sf_dir):
    """Aggregate-over-window with an explicit ROWS frame; decimal inside,
    double out (same determinism rule as the group-by aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "running_total"
        ),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal), 9) AS pct_rank,
           ROUND(CUME_DIST()    OVER (ORDER BY s_acctbal), 9) AS cume
    FROM supplier
    """,
)
def window_distribution(spark, sf_dir):
    """percent_rank/cume_dist. The supplier table is small enough for a
    single-partition window locally; at scale these run per-partition-key
    or via a two-pass rank + total-count join."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_near_size
    FROM part WHERE p_partkey <= 100
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based) vs ROWS frame (offset-based)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    w = W.orderBy("p_size").rangeBetween(-2, 2)
    return p.select(
        "p_partkey", "p_size", F.count("*").over(w).alias("n_near_size")
    )


@query(
    "window_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM events WHERE user_id < 5
    )
    SELECT event_id, user_id,
           ROUND(LAST_VALUE(purchase_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS last_purchase_value
    FROM e
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS analytic windows (HiveQL surface): carry the most
    recent non-null observation forward — the fill-forward primitive of
    event/feature pipelines. last_value(ignorenulls=True) over a running
    frame; NULL until a user's first purchase."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 5)
        .select(
            "event_id",
            "user_id",
            F.when(F.col("event_type") == "purchase", F.col("value")).alias(
                "purchase_value"
            ),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.last("purchase_value", ignorenulls=True).over(w), 6
        ).alias("last_purchase_value"),
    )


@query(
    "window_ntile_buckets",
    oracle="""
    SELECT doc_id, source,
           CAST(NTILE(4) OVER (PARTITION BY source
                               ORDER BY n_chars, doc_id) AS INTEGER)
             AS length_quartile
    FROM documents
    """,
)
def window_ntile_buckets(spark, sf_dir):
    """NTILE bucketing — equal-count quartiles of document length
    within each source, the remaining §2.5 window function after
    ranking/analytic/distribution. Ties broken by doc_id so bucket
    edges are deterministic. Scale: source-keyed window (hash shuffle
    on source) — fine while groups fit a task; for corpus-sized groups
    the two-phase threshold pattern (`pipeline_curriculum_phases`)
    replaces the window, trading exact equal-count edges for
    value-crossing ones."""
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.ntile(4).over(w).alias("length_quartile"),
    )
