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
