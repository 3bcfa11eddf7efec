"""Round-15 optimization internals: the full-outer set-equality audit.

The audit legs moved from `anti(a,b) UNION anti(b,a)` (which duplicates
each side's whole subtree under the union — the expensive rebuild side
ran twice) to ONE full-outer join with per-side presence markers
(`dedup.set_equality_match`). These tests pin the boolean's truth table
so the rewrite can never silently weaken the audits: equality, a
missing key, an extra key, and duplicate-key sides must all behave
exactly as the two-anti-join form did.
"""

from __future__ import annotations

from hiveberg_spark.operators.dedup import set_equality_match


def _val(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][0]


def test_set_match_equal_sets_true(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "k int, v string")
    assert _val(set_equality_match(a, b, ["k", "v"], "ok")) is True


def test_set_match_missing_key_false(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(1,), (2,)], "k int")
    assert _val(set_equality_match(a, b, ["k"], "ok")) is False
    # and the mirror direction (the old union covered both anti-joins)
    assert _val(set_equality_match(b, a, ["k"], "ok")) is False


def test_set_match_disjoint_false(spark):
    a = spark.createDataFrame([(1,)], "k int")
    b = spark.createDataFrame([(2,)], "k int")
    assert _val(set_equality_match(a, b, ["k"], "ok")) is False


def test_set_match_duplicate_rows_compare_as_sets(spark):
    # duplicates matched by the other side never appeared in either
    # anti-join; the marker form must agree (set semantics, not bag)
    a = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    b = spark.createDataFrame([(1,), (2,), (2,)], "k int")
    assert _val(set_equality_match(a, b, ["k"], "ok")) is True


def test_set_match_empty_sides(spark):
    empty = spark.createDataFrame([], "k int")
    one = spark.createDataFrame([(1,)], "k int")
    assert _val(set_equality_match(empty, empty, ["k"], "ok")) is True
    assert _val(set_equality_match(empty, one, ["k"], "ok")) is False
    assert _val(set_equality_match(one, empty, ["k"], "ok")) is False
