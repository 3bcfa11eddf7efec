"""Incrementally-maintained materialized aggregates: refresh reads only
the appended delta, upserts only affected keys, equals a full
recompute, and refuses DML ranges."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.sources.materialized import MaterializedAggregate
from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v double").coalesce(1)


SPECS = {
    "n": ("count", ""),
    "total": ("sum", "v"),
    "vmin": ("min", "v"),
    "vmax": ("max", "v"),
}


def _expect(spark, src):
    return {
        (r.k, r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in src.scan(virtual_column=None)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }


def _got(mv):
    return {
        (r.k, r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in mv.read().collect()
    }


def test_refresh_equals_full_recompute(spark, warehouse):
    src = SnapshotTable.create(spark, os.path.join(warehouse, "src"))
    src.append(_rows(spark, [("a", 1.5), ("a", 2.0), ("b", -3.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "mv"), src, ["k"], SPECS
    )
    assert _got(mv) == _expect(spark, src)
    # delta touches one existing key and one new key
    src.append(_rows(spark, [("a", 10.0), ("c", 7.25)]))
    r = mv.refresh()
    assert r["updated_keys"] == 2
    assert _got(mv) == _expect(spark, src)
    # untouched key 'b' row carried; a no-op refresh moves nothing
    assert mv.refresh()["updated_keys"] == 0
    # the rollup is itself time-travelable: snapshot 1 = initial state
    first = mv.table().scan(snapshot_id=1, virtual_column=None)
    assert {r.k for r in first.collect()} == {"a", "b"}
    assert first.filter("k = 'a'").head().n == 2


def test_refresh_multiple_appends_one_pass(spark, warehouse):
    src = SnapshotTable.create(spark, os.path.join(warehouse, "src2"))
    src.append(_rows(spark, [("x", 1.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "mv2"), src, ["k"], SPECS
    )
    src.append(_rows(spark, [("x", 2.0)]))
    src.append(_rows(spark, [("y", 5.0)]))
    assert mv.refresh()["updated_keys"] == 2  # both commits in ONE pass
    assert _got(mv) == _expect(spark, src)


def test_refresh_across_cow_delete(spark, warehouse):
    # a DML range no longer refuses: the changelog path recomputes
    # delete-touched groups exactly (min/max can't retract) and drops
    # groups whose rows all vanished
    src = SnapshotTable.create(spark, os.path.join(warehouse, "src3"))
    src.append(_rows(spark, [("a", 1.0), ("a", 5.0), ("b", 2.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "mv3"), src, ["k"], SPECS
    )
    src.delete_where("v = 5.0")   # shrinks group a: max must retract
    src.delete_where("k = 'b'")   # group b vanishes entirely
    out = mv.refresh()
    assert out["updated_keys"] == 2
    assert _got(mv) == _expect(spark, src)
    assert {r.k for r in mv.read().collect()} == {"a"}


def test_refresh_mixed_append_and_mor_update(spark, warehouse):
    src = SnapshotTable.create(spark, os.path.join(warehouse, "src5"))
    src.append(_rows(spark, [("a", 1.0), ("b", 2.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "mv5"), src, ["k"], SPECS
    )
    # range mixes: plain append (group c = insert-only, additive merge),
    # MOR update (group a = delete+insert, recomputed)
    src.append(_rows(spark, [("c", 7.0)]))
    src.update_where("k = 'a'", {"v": "v + 10"}, mode="merge-on-read")
    out = mv.refresh()
    assert out["updated_keys"] == 2  # a recomputed, c merged; b untouched
    assert _got(mv) == _expect(spark, src)
    # second refresh is a no-op
    assert mv.refresh()["updated_keys"] == 0


def test_refresh_changelog_equals_recompute_after_churn(spark, warehouse):
    import random

    rng = random.Random(0x1710)
    src = SnapshotTable.create(
        spark, os.path.join(warehouse, "src6"), schema="k string, v double"
    )
    src.append(_rows(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "mv6"), src, ["k"], SPECS
    )
    for step in range(5):
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["append", "cow_del", "mor_upd"])
            if op == "append":
                src.append(
                    _rows(spark, [(rng.choice("abcd"), float(step))])
                )
            elif op == "cow_del":
                src.delete_where(f"v = {float(step - 1)}")
            else:
                src.update_where(
                    f"k = '{rng.choice('abc')}'",
                    {"v": "v + 0.5"},
                    mode="merge-on-read",
                )
        mv.refresh()
        assert _got(mv) == _expect(spark, src), f"diverged at step {step}"


def test_create_rejects_non_mergeable(spark, warehouse):
    src = SnapshotTable.create(spark, os.path.join(warehouse, "src4"))
    src.append(_rows(spark, [("a", 1.0)]))
    with pytest.raises(ValueError, match="not incrementally mergeable"):
        MaterializedAggregate.create(
            spark,
            os.path.join(warehouse, "mv4"),
            src,
            ["k"],
            {"med": ("median", "v")},
        )


def test_materialized_view_sql_statements(spark, warehouse):
    """CREATE/REFRESH/DROP MATERIALIZED VIEW through the SQL layer; the
    MV is queryable like any snapshot table."""
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    src = SnapshotTable.create(spark, os.path.join(warehouse, "ev"))
    src.append(_rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]))
    execute_sql(
        spark,
        warehouse,
        "CREATE MATERIALIZED VIEW ev_mv AS "
        "SELECT k, COUNT(*) AS n, SUM(v) AS total FROM ev GROUP BY k",
    )
    got = {
        (r.k, r.n, r.total)
        for r in execute_sql(
            spark, warehouse, "SELECT k, n, total FROM ev_mv"
        ).collect()
    }
    assert got == {("a", 2, 3.0), ("b", 1, 5.0)}
    src.append(_rows(spark, [("b", 1.0), ("c", 9.0)]))
    r = execute_sql(
        spark, warehouse, "REFRESH MATERIALIZED VIEW ev_mv"
    ).head()
    assert r.updated_keys == 2
    got = {
        (x.k, x.n, x.total)
        for x in execute_sql(
            spark, warehouse, "SELECT k, n, total FROM ev_mv"
        ).collect()
    }
    assert got == {("a", 2, 3.0), ("b", 2, 6.0), ("c", 1, 9.0)}
    # grammar guards
    with pytest.raises(ValueError, match="GROUP BY keys"):
        execute_sql(
            spark, warehouse,
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k, other, COUNT(*) AS n FROM ev GROUP BY k",
        )
    with pytest.raises(ValueError, match="COUNT"):
        execute_sql(
            spark, warehouse,
            "CREATE MATERIALIZED VIEW bad2 AS "
            "SELECT k, COUNT(v) AS n FROM ev GROUP BY k",
        )
    execute_sql(spark, warehouse, "DROP MATERIALIZED VIEW ev_mv")
    with pytest.raises(ValueError, match="no such materialized view"):
        execute_sql(spark, warehouse, "DROP MATERIALIZED VIEW ev_mv")


def test_changelog_refresh_pinned_to_boundary(spark, warehouse):
    # ADVICE r5: the delete-touched-group recompute must read the
    # source AT the refresh boundary `cur`, not the current head — a
    # commit landing between the changelog read and the recompute must
    # not be baked in now AND re-applied additively next refresh
    src = SnapshotTable.create(spark, os.path.join(warehouse, "racesrc"))
    src.append(_rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]))
    mv = MaterializedAggregate.create(
        spark, os.path.join(warehouse, "racemv"), src, ["k"], SPECS
    )
    src.delete_where("v = 1.0")  # DML -> changelog path, touches 'a'
    boundary = src._read_meta()["current_snapshot_id"]
    # the "racing" commit: lands after the boundary the refresh planned
    src.append(_rows(spark, [("a", 100.0)]))
    state = mv._state()
    mv._refresh_via_changelog(state, src, state["cursor"], boundary)
    got = {(r.k, r.n, r.total) for r in mv.read().collect()}
    assert got == {("a", 1, 2.0), ("b", 1, 5.0)}  # no 100.0 baked in
    # the next refresh folds the racing append in EXACTLY once
    mv.refresh()
    assert _got(mv) == _expect(spark, src)
