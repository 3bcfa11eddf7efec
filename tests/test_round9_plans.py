"""Physical-plan contracts for the round-9 operators — pin the scale
properties (no data-sized cartesians, bounded exchange counts, the
designed broadcast shapes) so a refactor can't silently regress them."""

from __future__ import annotations

import pytest

from hiveberg_spark import registry

registry.load_all()


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_url_dedup_single_aggregation_no_joins(spark, sf_dir):
    plan = _plan(registry.QUERIES["dedup_url_host"](spark, sf_dir))
    assert "Join" not in plan  # canonicalize + groupBy only
    assert plan.count("Exchange") <= 2  # the groupBy's partial/final pair


def test_binary_hamming_broadcasts_queries_never_cartesian(spark, sf_dir):
    from hiveberg_spark.operators.quantization import binary_hamming_topk

    plan = _plan(binary_hamming_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the corpus scan joins the 10-row query frame via broadcast (the
    # vec_id != qid predicate makes it a nested loop — against 10 rows
    # by design, never corpus x corpus)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_audit_rollups_are_pure_aggregations(spark, sf_dir):
    for name in ("text_tokenizer_fertility", "pipeline_pii_report"):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert "Join" not in plan, name
        assert plan.count("Exchange") <= 2, name


def test_cross_source_overlap_joins_count_frames_not_docs(spark, sf_dir):
    # the self-join input must be the per-(hash, source) COUNT frame:
    # both join children aggregate before the join (the skew guard)
    df = registry.QUERIES["dedup_cross_source_overlap"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    join_pos = plan.index("SortMergeJoin") if "SortMergeJoin" in plan else (
        plan.index("BroadcastHashJoin")
    )
    # an aggregate must appear in the operator listing before the join
    # consumes it (formatted mode lists children above the join)
    assert "HashAggregate" in plan[:join_pos]


def test_weighted_percentile_no_global_single_partition_sort(spark, sf_dir):
    plan = _plan(registry.QUERIES["agg_weighted_percentile"](spark, sf_dir))
    # window partitions by flag: the exchange is hashpartitioning on
    # flag, never a single-partition global sort of the fact table
    assert "SinglePartition" not in plan.split("Window")[0]


def test_waterfill_corpus_scan_is_one_aggregation(spark, sf_dir):
    df = registry.QUERIES["pipeline_budget_waterfill"](spark, sf_dir)
    plan = _plan(df)
    # the k-row source aggregate is persisted: every consumer reads
    # the InMemoryRelation (a formatted plan prints the cache's build
    # scan per reference, but execution scans the parquet once when
    # the cache is built)
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "CartesianProduct" not in plan
