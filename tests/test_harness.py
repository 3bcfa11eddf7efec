"""The local differential harness itself must be as strict as the
driver's type-sensitive value-hash — VERDICT r9 #5: the class of
failure that shipped CORRECTNESS_r08's `pipeline_data_card` red row
(Spark DECIMAL vs DuckDB DOUBLE, numerically identical) must be
rejected LOCALLY."""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from hiveberg_spark.testing import compare


def test_decimal_vs_float_asymmetry_is_rejected(spark):
    sdf = spark.createDataFrame(
        [(1, Decimal("2.50")), (2, Decimal("3.75"))],
        "id long, v decimal(10,2)",
    )
    oracle = pd.DataFrame({"id": [1, 2], "v": [2.50, 3.75]})
    problems = compare(sdf, oracle)
    assert problems, "Decimal-vs-float drift must be flagged"
    assert any("dtype" in p and "'v'" in p for p in problems), problems


def test_decimal_on_both_sides_is_accepted(spark):
    sdf = spark.createDataFrame(
        [(1, Decimal("2.50")), (2, Decimal("3.75"))],
        "id long, v decimal(10,2)",
    )
    oracle = pd.DataFrame(
        {"id": [1, 2], "v": [Decimal("2.5"), Decimal("3.75")]}
    )
    assert compare(sdf, oracle) == []


def test_float_vs_int_still_rejected_without_nulls(spark):
    sdf = spark.createDataFrame([(1, 2.0)], "id long, v double")
    oracle = pd.DataFrame({"id": [1], "v": [2]})
    problems = compare(sdf, oracle)
    assert any("dtype" in p for p in problems), problems


def test_tracked_caches_released_between_queries(spark, sf_dir):
    """VERDICT r9 #8: report/composition ops persist shared frames; the
    registry wrapper must release the previous query's tracked caches,
    so running the report family back-to-back shows NO net growth in
    the JVM's persistent-RDD map (storage memory stays bounded at one
    query's working set)."""
    from hiveberg_spark import registry
    from hiveberg_spark.caching import release_tracked

    registry.load_all()
    names = [
        "pipeline_dedup_cascade_report",
        "pipeline_contamination_report",
        "pipeline_budget_waterfill",
        "sample_dsir_weights",
        "pipeline_curriculum_phases",
        "pipeline_length_bucketed_batches",
        "dedup_containment",
        "text_kneser_ney_bigram",
    ]

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    for name in names:
        registry.QUERIES[name](spark, sf_dir).collect()
    release_tracked()
    after_first = n_cached()
    for name in names:
        registry.QUERIES[name](spark, sf_dir).collect()
    release_tracked()
    assert n_cached() <= after_first
