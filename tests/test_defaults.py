"""Default values on ADD COLUMN (Iceberg v3 default-value semantics —
initial defaults for pre-existing files, write defaults for later
appends that omit the column). The reference's Iceberg 0.7 predates
the feature entirely; the contract followed here is the public Iceberg
v3 spec (default-values section)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _t(spark, warehouse, name):
    return SnapshotTable.create(spark, os.path.join(warehouse, name))


def test_initial_default_fills_pre_add_files(spark, warehouse):
    t = _t(spark, warehouse, "init")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: 7, 2: 7}


def test_post_add_explicit_null_survives(spark, warehouse):
    # the case a blanket coalesce corrupts: a file written AFTER the
    # add stores an explicit NULL — it must stay NULL
    t = _t(spark, warehouse, "nulls")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.append(
        spark.createDataFrame(
            [(2, "b", None), (3, "c", 30)], "id long, data string, tier int"
        )
    )
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: 7, 2: None, 3: 30}


def test_write_default_is_physical(spark, warehouse):
    # an append omitting the column bakes the default into its files:
    # the raw parquet (no snapshot-table read path) must carry it
    t = _t(spark, warehouse, "wd")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    sid = t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    meta = t._read_meta()
    snap = next(s for s in meta["snapshots"] if s["snapshot_id"] == sid)
    new_files = [os.path.join(t.location, f) for f in t._read_manifest(snap)]
    raw = spark.read.parquet(*new_files)
    assert "tier" in raw.columns
    assert [r.tier for r in raw.collect()] == [7]


def test_default_expression_and_string_type(spark, warehouse):
    t = _t(spark, warehouse, "expr")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("src", "string", default_sql="'unknown'")
    t.add_column("score", "double", default_sql="1.5 * 2")
    row = t.scan().head()
    assert row.src == "unknown" and row.score == 3.0


def test_invalid_default_rejected_at_add_time(spark, warehouse):
    t = _t(spark, warehouse, "bad")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    with pytest.raises(ValueError, match="DEFAULT"):
        t.add_column("tier", "int", default_sql="id + 1")  # column ref
    assert "tier" not in (t.schema() or []).fieldNames()


def test_cow_rewrite_bakes_defaults(spark, warehouse):
    # UPDATE rewrites pre-add files through the default-applying read,
    # so the rewritten files physically carry the default, and the
    # untouched rows still read it via the initial-default path
    t = _t(spark, warehouse, "cow")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.update_where("id = 1", {"data": "'A'"})
    rows = {r.id: (r.data, r.tier) for r in t.scan().collect()}
    assert rows == {1: ("A", 7), 2: ("b", 7)}


def test_time_travel_reads_default_through_current_schema(spark, warehouse):
    # history reads through the CURRENT schema (Iceberg semantics):
    # a pre-add snapshot surfaces the column with its initial default
    t = _t(spark, warehouse, "tt")
    s1 = t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.append(spark.createDataFrame([(2, "b", 20)], "id long, data string, tier int"))
    old = t.scan(snapshot_id=s1).collect()
    assert [(r.id, r.tier) for r in old] == [(1, 7)]


def test_drop_column_purges_default(spark, warehouse):
    t = _t(spark, warehouse, "drop")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.drop_column("tier")
    assert "tier" not in t.scan().columns
    assert t._read_meta().get("defaults") == []


def test_rename_keeps_default(spark, warehouse):
    t = _t(spark, warehouse, "ren")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.rename_column("tier", "rank")
    rows = t.scan().collect()
    assert [r.rank for r in rows] == [7]
    # a post-rename append omitting the column still gets the write
    # default under the new name
    t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    rows = {r.id: r.rank for r in t.scan().collect()}
    assert rows == {1: 7, 2: 7}


def test_sql_alter_add_column_default(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = _t(spark, warehouse, "sqlpath")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    execute_sql(
        spark, warehouse, "ALTER TABLE sqlpath ADD COLUMN tier int DEFAULT 42"
    )
    assert [r.tier for r in t.scan().collect()] == [42]


def test_incremental_read_applies_defaults(spark, warehouse):
    t = _t(spark, warehouse, "incr")
    s1 = t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    s2 = t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.append(spark.createDataFrame([(3, "c", None)], "id long, data string, tier int"))
    # delta (s1, current]: file from s2 predates the add -> default;
    # the post-add file's explicit NULL survives
    rows = {r.id: r.tier for r in t.scan_changes(s1).collect()}
    assert rows == {2: 7, 3: None}


def test_default_with_merge_on_read_delete(spark, warehouse):
    t = _t(spark, warehouse, "mor")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.delete_where("id = 1")
    rows = [(r.id, r.tier) for r in t.scan().collect()]
    assert rows == [(2, 7)]


def test_defaults_model_based_random_ops(spark, warehouse):
    """Model-based check of default-value semantics under churn: a
    seeded random op sequence (appends with the column / with explicit
    NULL / omitting it, COW + MOR deletes, MOR updates, compaction)
    runs against the table and a python dict model; the scan must equal
    the model after every step. The add lands mid-sequence, so every
    later op mixes pre-add files (initial default), post-add files
    (physical values incl. NULL), and write-defaulted files."""
    import random

    from hiveberg_spark.sources.snapshot_table import SnapshotTable

    rng = random.Random(0xDEF0514)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "dmodel"), schema="id long, data string"
    )
    model: dict[int, tuple[str, object]] = {}  # id -> (data, tier)
    next_id = 0
    added = False

    def check():
        cols = ["id", "data"] + (["tier"] if added else [])
        got = {
            (r.id, r.data, r.tier if added else None)
            for r in t.scan(virtual_column=None).select(*cols).collect()
        }
        want = {(i, d, tr if added else None) for i, (d, tr) in model.items()}
        assert got == want, (sorted(got), sorted(want))

    for step in range(16):
        if step == 5:
            t.add_column("tier", "int", default_sql="7")
            model = {i: (d, 7) for i, (d, _) in model.items()}
            added = True
            check()
            continue
        op = rng.choice(
            ["append", "append", "cow_del", "mor_del", "mor_upd", "compact"]
        )
        if op == "append" or not model:
            n = rng.randint(1, 3)
            ids = list(range(next_id, next_id + n))
            next_id += n
            if not added:
                t.append(
                    spark.createDataFrame(
                        [(i, f"v{step}") for i in ids], "id long, data string"
                    ).coalesce(1)
                )
                model.update({i: (f"v{step}", 7) for i in ids})
            else:
                shape = rng.choice(["omit", "explicit", "null"])
                if shape == "omit":  # write default bakes 7
                    t.append(
                        spark.createDataFrame(
                            [(i, f"v{step}") for i in ids],
                            "id long, data string",
                        ).coalesce(1)
                    )
                    model.update({i: (f"v{step}", 7) for i in ids})
                elif shape == "explicit":
                    t.append(
                        spark.createDataFrame(
                            [(i, f"v{step}", int(i)) for i in ids],
                            "id long, data string, tier int",
                        ).coalesce(1)
                    )
                    model.update({i: (f"v{step}", int(i)) for i in ids})
                else:  # explicit NULL must survive every later rewrite
                    t.append(
                        spark.createDataFrame(
                            [(i, f"v{step}", None) for i in ids],
                            "id long, data string, tier int",
                        ).coalesce(1)
                    )
                    model.update({i: (f"v{step}", None) for i in ids})
        elif op == "cow_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}")
            del model[victim]
        elif op == "mor_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}", mode="merge-on-read")
            del model[victim]
        elif op == "mor_upd":
            victim = rng.choice(sorted(model))
            t.update_where(
                f"id = {victim}", {"data": f"'u{step}'"}, mode="merge-on-read"
            )
            model[victim] = (f"u{step}", model[victim][1])
        elif op == "compact":
            t.compact()
        check()


def test_set_and_drop_column_default(spark, warehouse):
    # ALTER COLUMN SET DEFAULT changes the WRITE default only; the
    # initial default (what pre-add files read) is immutable
    t = _t(spark, warehouse, "setdef")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    t.set_column_default("tier", "9")
    t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: 7, 2: 9}  # pre-add file keeps initial default 7
    t.drop_column_default("tier")
    t.append(spark.createDataFrame([(3, "c")], "id long, data string"))
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: 7, 2: 9, 3: None}


def test_write_default_on_column_without_initial(spark, warehouse):
    # a column that always existed gains a write default: historical
    # files keep NULL (no initial default to resurrect)
    t = _t(spark, warehouse, "wonly")
    t.append(
        spark.createDataFrame([(1, "a", None)], "id long, data string, tier int")
    )
    t.set_column_default("tier", "5")
    t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: None, 2: 5}


def test_create_table_with_default_and_show_create_roundtrip(spark, warehouse):
    from hiveberg_spark.sources.snapshot_table import SnapshotTable
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    execute_sql(
        spark,
        warehouse,
        "CREATE TABLE defct (id bigint, data string, tier int DEFAULT 3)",
    )
    t = SnapshotTable.load(spark, os.path.join(warehouse, "defct"))
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    assert [r.tier for r in t.scan().collect()] == [3]
    ddl = execute_sql(spark, warehouse, "SHOW CREATE TABLE defct").head()[0]
    assert "tier int DEFAULT 3" in ddl
    # the emitted DDL round-trips through the CREATE parser
    execute_sql(spark, warehouse, ddl.replace("defct", "defct2"))
    t2 = SnapshotTable.load(spark, os.path.join(warehouse, "defct2"))
    t2.append(spark.createDataFrame([(9, "z")], "id long, data string"))
    assert [r.tier for r in t2.scan().collect()] == [3]


def test_sql_alter_column_set_drop_default(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = _t(spark, warehouse, "sqldef")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    execute_sql(
        spark, warehouse, "ALTER TABLE sqldef ADD COLUMN tier int DEFAULT 7"
    )
    execute_sql(
        spark, warehouse, "ALTER TABLE sqldef ALTER COLUMN tier SET DEFAULT 11"
    )
    t.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    execute_sql(
        spark, warehouse, "ALTER TABLE sqldef ALTER COLUMN tier DROP DEFAULT"
    )
    t.append(spark.createDataFrame([(3, "c")], "id long, data string"))
    rows = {r.id: r.tier for r in t.scan().collect()}
    assert rows == {1: 7, 2: 11, 3: None}


def test_set_default_invalid_rejected(spark, warehouse):
    t = _t(spark, warehouse, "badset")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    with pytest.raises(ValueError, match="no such column"):
        t.set_column_default("nope", "1")
    with pytest.raises(ValueError, match="DEFAULT"):
        t.set_column_default("data", "id + 1")
    with pytest.raises(ValueError, match="no default"):
        t.drop_column_default("data")


def test_describe_extended_shows_defaults(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = _t(spark, warehouse, "desc")
    t.append(spark.createDataFrame([(1, "a")], "id long, data string"))
    t.add_column("tier", "int", default_sql="7")
    rows = execute_sql(spark, warehouse, "DESCRIBE EXTENDED desc").collect()
    dflt = [r for r in rows if r.kind == "default"]
    assert [(r.col_name, r.data_type) for r in dflt] == [("tier", "DEFAULT 7")]
