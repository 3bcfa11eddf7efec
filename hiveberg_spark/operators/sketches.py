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
