"""Unit tests for plans.all_pairs_offenders — the classifier behind the
registry-wide all-pairs sweep. Built on synthetic DataFrames so both
directions are pinned: a genuine data×data nested loop MUST flag, and
the legitimate bounded shapes (one-row aggregates, limits, literal
ranges) MUST pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.plans import all_pairs_offenders


@pytest.fixture()
def docs(spark, sf_dir):
    from hiveberg_spark.catalog import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


def test_data_by_data_nonequi_self_join_flags(docs):
    a = docs.select(F.col("doc_id").alias("ida"), F.col("n_chars").alias("ca"))
    b = docs.select(F.col("doc_id").alias("idb"), F.col("n_chars").alias("cb"))
    off = all_pairs_offenders(a.join(b, F.col("ida") < F.col("idb")))
    assert off, "the all-pairs self-join anti-pattern must be flagged"


def test_cartesian_of_two_data_tables_flags(spark, sf_dir, docs):
    from hiveberg_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    off = all_pairs_offenders(docs.crossJoin(e))
    assert off


def test_cross_join_against_one_row_aggregate_passes(docs):
    stats = docs.agg(F.avg("n_chars").alias("mean_chars"))
    off = all_pairs_offenders(docs.crossJoin(F.broadcast(stats)))
    assert off == []


def test_cross_join_against_limit_passes(docs):
    head = docs.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("top_id")
    )
    off = all_pairs_offenders(docs.crossJoin(F.broadcast(head)))
    assert off == []


def test_cross_join_against_literal_range_passes(spark, docs):
    grid = spark.range(5).select(F.col("id").alias("bucket"))
    off = all_pairs_offenders(docs.crossJoin(F.broadcast(grid)))
    assert off == []


def test_equi_join_never_flags(docs):
    a = docs.select(F.col("doc_id").alias("k"), "n_chars")
    b = docs.select(F.col("doc_id").alias("k"))
    off = all_pairs_offenders(a.join(b, "k"))
    assert off == []


def test_plan_nodes_depth_parse():
    from hiveberg_spark.plans.inspect import _plan_nodes

    plan = (
        "== Physical Plan ==\n"
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- Project [a]\n"
        "   +- BroadcastNestedLoopJoin BuildRight, Cross\n"
        "      :- FileScan parquet [a]\n"
        "      +- BroadcastExchange\n"
        "         +- HashAggregate(keys=[], functions=[avg(x)])\n"
    )
    nodes = _plan_nodes(plan)
    texts = [t for _, t in nodes]
    assert "AdaptiveSparkPlan isFinalPlan=false" in texts
    join_depth = next(d for d, t in nodes if "BroadcastNestedLoopJoin" in t)
    child_depths = [
        d
        for d, t in nodes
        if t.startswith(("FileScan", "BroadcastExchange"))
    ]
    assert all(d > join_depth for d in child_depths)
    assert len(set(child_depths)) == 1  # both children at the same depth
