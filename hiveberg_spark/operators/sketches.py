"""Approximate (sketch-based) aggregates (SURVEY.md §2.4), declared as
oracle-CHECKABLE contracts.

Sketch values (HyperLogLog++, KLL/GK percentile) are engine-specific by
design, so a value-hash against DuckDB can never match. Instead each
query emits the *contract* the sketch guarantees — a Spark-computed
boolean comparing the approximate result against the exact one — and the
oracle asserts the contract holds (`true` per group). The sketch still
runs for real; only the checked projection is the tolerance predicate
(VERDICT r1 "what's wrong" #1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag, TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++, rsd=0.02) — the 100 TB
    substitute for exact distinct: single pass, constant memory per
    group. Contract: the estimate lands within 5% of the exact count
    (2.5 standard relative deviations) for every group — Spark computes
    both and compares; the oracle asserts the contract."""
    li = load_table(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    return est.select(
        "l_returnflag",
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.col("exact") * F.lit(0.05)
        ).alias("within_tol"),
    )


@query(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag, TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_approx(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna, accuracy=1000) — bounded rank
    error ~1/accuracy. Contract: the approximate median's value lies
    between the exact 45th and 55th percentiles of the group (a 50×
    safety margin on the rank bound); oracle asserts it holds."""
    li = load_table(spark, sf_dir, "lineitem")
    est = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.percentile("l_extendedprice", F.lit(0.45)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.55)).alias("hi"),
    )
    return est.select(
        "l_returnflag",
        F.col("approx_median").between(F.col("lo"), F.col("hi")).alias("within_tol"),
    )


@query(
    "sketch_hll_partitioned_merge",
    oracle="""
    SELECT r.r_name, COUNT(DISTINCT n.n_nationkey) AS n_parts, TRUE AS within_tol
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def sketch_hll_partitioned_merge(spark, sf_dir):
    """Mergeable-sketch partial aggregation (Apache DataSketches HLL,
    `hll_sketch_agg` / `hll_union_agg`) — THE 100 TB distinct-count
    pattern: each partition/segment builds its own fixed-size sketch
    (here one per nation), and coarser rollups come from merging the
    binary sketches, never re-reading the data. At scale the per-nation
    sketches would be materialized once (e.g. per ingest batch) and
    every later region/global query is a pure sketch-union over KBs.

    Contract: the region-level estimate from unioning the 5 per-nation
    sketches lands within 5% of the exact region distinct count; the
    oracle asserts the contract plus the exact merge fan-in."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.expr("hll_sketch_agg(c_custkey, 14)").alias("sketch"),
            F.countDistinct("c_custkey").alias("exact"),
        )
    )
    merged = per_nation.groupBy("n_regionkey").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("approx"),
        F.sum("exact").alias("exact"),  # custkeys are disjoint across nations
        F.countDistinct("n_nationkey").alias("n_parts"),
    )
    return merged.join(F.broadcast(region), merged.n_regionkey == region.r_regionkey).select(
        "r_name",
        "n_parts",
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.col("exact") * F.lit(0.05)
        ).alias("within_tol"),
    )


_CMS_W = 2048  # buckets per hash row
_CMS_D = 4  # independent hash rows; estimate = min over rows


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           TRUE AS cms_ge_exact, TRUE AS cms_within_bound
    FROM events GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id LIMIT 10
    """,
)
def sketch_cms_heavy_hitters(spark, sf_dir):
    """COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    2005) — the mergeable constant-memory substitute for exact per-key
    counts in a streaming/sharded pipeline: {_CMS_D} hash rows x
    {_CMS_W} buckets, point estimate = min over rows of the key's
    bucket sum. Built the way a 100 TB run would: per-key partial
    counts first (map-side combinable), then each key's count added
    into its {_CMS_D} buckets — {_CMS_D} aggregates of {_CMS_W} cells,
    each a broadcastable d*w matrix, mergeable across shards/windows by
    cell-wise addition exactly as CMS merges. Contract (house sketch
    pattern): for the top-10 users by exact count, the CMS estimate is
    >= exact (structural one-sided error) and within 4N/w of it (the
    epsilon bound with a 4x safety margin; P[miss] < e^-{_CMS_D} per
    the standard analysis). xxhash64(seed=row) plays the pairwise-
    independent family."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    n_total = ev.count()
    bound = 4.0 * n_total / _CMS_W
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    per_key = per_key.persist()
    est = None
    for row in range(_CMS_D):
        bucket = F.pmod(F.xxhash64(F.lit(row), F.col("user_id")), F.lit(_CMS_W))
        cells = (
            per_key.groupBy(bucket.alias("b"))
            .agg(F.sum("cnt").alias("cell"))
            .withColumnRenamed("b", f"b{row}")
            .withColumnRenamed("cell", f"cell{row}")
        )
        keyed = per_key.select(
            "user_id", "cnt", bucket.alias(f"b{row}")
        ) if est is None else est.withColumn(f"b{row}", bucket)
        est = keyed.join(F.broadcast(cells), f"b{row}").drop(f"b{row}")
    est = est.withColumn(
        "cms", F.least(*[F.col(f"cell{r}") for r in range(_CMS_D)])
    )
    return (
        est.orderBy(F.col("cnt").desc(), "user_id")
        .limit(10)
        .select(
            "user_id",
            F.col("cnt").cast("long").alias("exact_cnt"),
            (F.col("cms") >= F.col("cnt")).alias("cms_ge_exact"),
            (F.col("cms") - F.col("cnt") <= F.lit(bound)).alias(
                "cms_within_bound"
            ),
        )
    )
