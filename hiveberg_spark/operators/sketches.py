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

from hiveberg_spark.caching import persist_tracked
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
    per_key = persist_tracked(per_key)
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


# -- HLL set-intersection estimation (round 9) -------------------------------------

_HLL_INTER_TOL = 0.15  # relative tolerance + the sketch's small-range floor


@query(
    "sketch_hll_intersection",
    oracle="""
    WITH pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    )
    SELECT p.type_a, p.type_b,
           CAST((SELECT COUNT(*) FROM
                  (SELECT DISTINCT user_id FROM events WHERE event_type = p.type_a)
                  ua JOIN
                  (SELECT DISTINCT user_id FROM events WHERE event_type = p.type_b)
                  ub USING (user_id)) AS BIGINT) AS exact_overlap,
           TRUE AS within_tol
    FROM pairs p
    """,
)
def sketch_hll_intersection(spark, sf_dir):
    """HLL SET-INTERSECTION estimation — audience overlap from sketches
    alone, the query a 100 TB system answers WITHOUT re-scanning raw
    data: |A∩B| ≈ est(A) + est(B) − est(A∪B), where each per-segment
    HLL is built once (mergeable, 16 KB) and the union comes from
    `hll_union_agg` — the same sketch algebra
    `sketch_hll_partitioned_merge` pins for unions, extended by
    inclusion-exclusion. Contract: for every event-type pair, the
    estimate lands within {_HLL_INTER_TOL:.0%} + the standard-error
    floor of the exact overlap (both engines recompute the exact side;
    the tolerance absorbs the inclusion-exclusion error compounding).
    Shape: one sketch per segment (map-side combined), pair math on
    broadcast-sized sketch rows — raw data scanned exactly once."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("n_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = pairs.select(
        "type_a",
        "type_b",
        (
            F.expr("hll_sketch_estimate(sk_a)")
            + F.expr("hll_sketch_estimate(sk_b)")
            - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
        ).alias("est_inter"),
    )
    ua = ev.distinct().select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    ub = ev.distinct().select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b")
    )
    exact = (
        ua.join(
            ub,
            (F.col("type_a") < F.col("type_b"))
            & (F.col("user_id") == F.col("uid_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_overlap"))
    )
    tol = F.col("exact_overlap") * _HLL_INTER_TOL + F.lit(64.0)
    return est.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.col("exact_overlap").cast("long").alias("exact_overlap"),
        (F.abs(F.col("est_inter") - F.col("exact_overlap")) <= tol).alias(
            "within_tol"
        ),
    )
