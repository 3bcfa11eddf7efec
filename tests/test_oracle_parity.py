"""Differential test: every registered query with an oracle must match
DuckDB exactly (the driver's correctness gate, run locally at sf0.001;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from hiveberg_spark import registry
from hiveberg_spark.testing import compare

registry.load_all()

_WITH_ORACLE = sorted(registry.ORACLES)
_ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    result = registry.QUERIES[name](spark, sf_dir)
    oracle = duck.sql(registry.ORACLES[name]).df()
    problems = compare(result, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    # toPandas (not count) so every output column is actually computed —
    # count() lets Catalyst prune the interesting expressions away
    pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    assert pdf is not None
    assert len(pdf.columns) > 0
