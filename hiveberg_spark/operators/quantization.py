"""Scalar-quantized (int8) similarity search [N] — the storage/bandwidth
side of ANN at 100 TB, complementing the recall-side buckets in
simsearch.py (hyperplane LSH, IVF).

Technique (the standard SQ8 pattern, e.g. Faiss IndexScalarQuantizer):
per-dimension min/max over the corpus define a linear int8 code; the
scan-and-score pass runs on codes (4× fewer bytes than float32 — at
100 TB that is the difference between a 25 TB and a 100 TB scan), then
only the top `RERANK_FACTOR × k` candidates per query are re-scored
with exact float cosine. Registered to the driver as the
`simsearch_sq8_rerank` recall contract (VERDICT r4 #3): the coarse
ranking itself is quantization-dependent, so the oracle pins the
contract row, not the ranks; exact-score agreement of overlapping hits
is asserted in tests/test_llm_ops.py.

In this demo both the codes and the raw vectors live in one in-memory
frame; a production deployment materializes the code table once (same
snapshot-table machinery as every other table here) and scans it
instead of the float table — the plumbing, not the math, is the only
difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query
from hiveberg_spark.operators.simsearch import (
    RECALL_CONTRACT_SQL,
    TOP_K,
    _N_QUERIES,
    _dot,
    _norm,
    recall_contract,
    simsearch_bruteforce_topk,
)

RERANK_FACTOR = 4  # exact-rescored candidates per query = factor × k


def _dimension_bounds(e: DataFrame) -> DataFrame:
    """One row: (mins: array<double>, maxs: array<double>) per-dimension
    corpus bounds — a tiny all-reduce (posexplode → per-dim min/max →
    sorted re-assembly), no driver-side collect."""
    flat = e.select(F.posexplode("embedding").alias("pos", "v"))
    per_dim = flat.groupBy("pos").agg(
        F.min(F.col("v").cast("double")).alias("mn"),
        F.max(F.col("v").cast("double")).alias("mx"),
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s.mn
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s.mx
        ).alias("maxs"),
    )


def _quantize(vec, mins, maxs):
    """int8 code per element: round(254 * (x-mn)/(mx-mn)) - 127, with
    degenerate (mx == mn) dimensions coded 0."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    return F.transform(
        idx,
        lambda i: F.when(
            F.element_at(maxs, i + 1) > F.element_at(mins, i + 1),
            (
                F.round(
                    F.lit(254.0)
                    * (F.element_at(vec, i + 1).cast("double") - F.element_at(mins, i + 1))
                    / (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
                )
                - F.lit(127)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )


def sq8_topk(spark, sf_dir):
    """Int8 scalar-quantization search with exact rerank: score the
    whole corpus on int8 codes (integer dot product — the bandwidth-
    and SIMD-friendly pass), keep the top RERANK_FACTOR×k per query,
    re-score those with exact float cosine, return the top k.

    Output schema matches simsearch_bruteforce_topk (qid, vec_id,
    cosine) — the recall contract and tests measure overlap directly."""
    e = load_table(spark, sf_dir, "embeddings")
    bounds = _dimension_bounds(e)  # 1 row; AQE broadcasts the join
    coded = e.crossJoin(bounds).select(
        "vec_id",
        "embedding",
        _quantize(F.col("embedding"), F.col("mins"), F.col("maxs")).alias("code"),
    )
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("code").alias("qcode"),
    )
    approx = (
        coded.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "qv",
            "embedding",
            F.aggregate(
                F.zip_with(
                    F.col("qcode"), F.col("code"), lambda x, y: (x * y).cast("long")
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    wq = W.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("vec_id"))
    survivors = approx.withColumn("crn", F.row_number().over(wq)).filter(
        F.col("crn") <= TOP_K * RERANK_FACTOR
    )
    exact = survivors.select(
        "qid",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine")
    )


# Measured recall with a 4×k exact rerank: 1.00 (sf0.001) / 0.98
# (sf0.01) — int8 on 64-dim vectors is near-lossless for ranking.
# Bound 0.9 = the long-standing test floor.
_SQ8_RECALL_BOUND = 0.9


@query("simsearch_sq8_rerank", oracle=RECALL_CONTRACT_SQL)
def simsearch_sq8_rerank(spark, sf_dir):
    """SQ8 search as a driver-checked recall contract (VERDICT r4 #3):
    the quantize→coarse-score→rerank pipeline (sq8_topk) measured
    against the exact baseline, one pinned row."""
    return recall_contract(
        simsearch_bruteforce_topk(spark, sf_dir),
        sq8_topk(spark, sf_dir),
        _SQ8_RECALL_BOUND,
    )
