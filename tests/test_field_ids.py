"""Synthetic FIELD-ID schema resolution (VERDICT r5 #4): the reference
resolves columns by Iceberg field id (IcebergSerDe.java:60-62), so
rename-then-reuse is safe — `rename a->b` then `add a` reads OLD files'
physical `a` as `b` and NEW files' physical `a` as the new field. The
name-based rename log alone mis-resolves that; these tests pin the
id-mapped read path end to end."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _df(spark, rows, schema="id long, a string"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def test_rename_then_reuse_reads_both_generations(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "reuse"))
    t.append(_df(spark, [(1, "old1"), (2, "old2")]))
    t.rename_column("a", "b")
    t.add_column("a", "string")  # reuses the freed name
    t.append(
        spark.createDataFrame(
            [(3, "old3", "new3")], "id long, b string, a string"
        ).coalesce(1)
    )
    rows = {r.id: (r.b, r.a) for r in t.scan(virtual_column=None).collect()}
    assert rows == {
        1: ("old1", None),  # pre-rename file: physical a IS b; new a null
        2: ("old2", None),
        3: ("old3", "new3"),
    }


def test_reuse_filters_and_scan_where_are_correct(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "filt"))
    t.append(_df(spark, [(1, "x"), (2, "y")]))
    t.rename_column("a", "b")
    t.add_column("a", "string")
    t.append(
        spark.createDataFrame(
            [(3, "z", "x")], "id long, b string, a string"
        ).coalesce(1)
    )
    # probe on the NEW a: only row 3 has a='x' (row 1's physical 'x'
    # belongs to field b) — the exact mis-resolution the name log had
    assert [r.id for r in t.scan_where("a = 'x'").collect()] == [3]
    assert sorted(r.id for r in t.scan_where("b = 'x'").collect()) == [1]
    # pruning on tainted names is disabled but never wrong
    assert sorted(
        os.path.basename(os.path.dirname(p))
        for p in t.plan_files("a = 'x'")
    ) == sorted(
        os.path.basename(os.path.dirname(p)) for p in t.plan_files()
    )


def test_reuse_survives_cow_rewrite_and_time_travel(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cow"))
    s1 = t.append(_df(spark, [(1, "x"), (2, "y")]))
    t.rename_column("a", "b")
    t.add_column("a", "string")
    t.append(
        spark.createDataFrame(
            [(3, "z", "n3"), (4, "w", "n4")], "id long, b string, a string"
        ).coalesce(1)
    )
    t.delete_where("id = 4")  # COW rewrite of the new-generation file
    rows = {r.id: (r.b, r.a) for r in t.scan(virtual_column=None).collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", "n3")}
    # time travel reads history through the CURRENT schema
    old = {r.id: (r.b, r.a) for r in t.scan(snapshot_id=s1).collect()}
    assert old == {1: ("x", None), 2: ("y", None)}


def test_swap_rename_resolves_atomically(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "swap"))
    t.append(
        spark.createDataFrame(
            [(1, "was_a", "was_b")], "id long, a string, b string"
        ).coalesce(1)
    )
    t.rename_column("a", "tmp_swap")
    t.rename_column("b", "a")
    t.rename_column("tmp_swap", "b")
    rows = {r.id: (r.a, r.b) for r in t.scan(virtual_column=None).collect()}
    assert rows == {1: ("was_b", "was_a")}


def test_reuse_refused_on_pre_id_files(spark, warehouse, tmp_path):
    # a table whose live files predate id tracking must refuse reuse
    # (legacy files would mis-resolve); simulate by stripping the maps
    import json

    t = SnapshotTable.create(spark, os.path.join(warehouse, "legacy"))
    t.append(_df(spark, [(1, "x")]))
    meta = t._read_meta()
    for s in meta["snapshots"]:
        mpath = os.path.join(t.location, s["manifest"])
        doc = json.load(open(mpath))
        doc.pop("name_maps", None)
        doc.pop("file_name_map", None)
        json.dump(doc, open(mpath, "w"))
    t.rename_column("a", "b")
    with pytest.raises(ValueError, match="reuse"):
        t.add_column("a", "string")


def test_reuse_with_default_on_new_field(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "dflt"))
    t.append(_df(spark, [(1, "x")]))
    t.rename_column("a", "b")
    t.add_column("a", "string", default_sql="'filled'")
    t.append(
        spark.createDataFrame(
            [(2, "y", "real")], "id long, b string, a string"
        ).coalesce(1)
    )
    rows = {r.id: (r.b, r.a) for r in t.scan(virtual_column=None).collect()}
    # pre-add file reads the initial default for the NEW a; its
    # physical a still resolves to b
    assert rows == {1: ("x", "filled"), 2: ("y", "real")}


def test_clone_carries_field_ids(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "csrc"))
    t.append(_df(spark, [(1, "x")]))
    t.rename_column("a", "b")
    t.add_column("a", "string")
    t.append(
        spark.createDataFrame(
            [(2, "y", "n2")], "id long, b string, a string"
        ).coalesce(1)
    )
    clone = SnapshotTable.snapshot_of(
        spark, t.location, os.path.join(warehouse, "cdst")
    )
    rows = {
        r.id: (r.b, r.a) for r in clone.scan(virtual_column=None).collect()
    }
    assert rows == {1: ("x", None), 2: ("y", "n2")}
    # and the clone's own evolution keeps working on carried files
    clone.rename_column("b", "c")
    rows = {
        r.id: (r.c, r.a) for r in clone.scan(virtual_column=None).collect()
    }
    assert rows == {1: ("x", None), 2: ("y", "n2")}


def test_drop_via_retired_field_id(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "drop"))
    t.append(_df(spark, [(1, "x")]))
    t.drop_column("a")
    assert [c for c in t.scan(virtual_column=None).columns] == ["id"]
    # drop-then-readd stays refused (resurrection guard, unchanged)
    with pytest.raises(ValueError, match="re-add dropped"):
        t.add_column("a", "string")


def test_field_ids_are_stable_and_monotonic(spark, warehouse):
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "ids"), schema="id long, a string"
    )
    meta = t._read_meta()
    assert meta["fields"] == [
        {"id": 1, "name": "id"},
        {"id": 2, "name": "a"},
    ]
    t.rename_column("a", "b")
    t.add_column("a", "string")
    t.drop_column("b")
    meta = t._read_meta()
    assert meta["fields"] == [
        {"id": 1, "name": "id"},
        {"id": 3, "name": "a"},
    ]
    assert meta["next_field_id"] == 4
    assert meta["reused_names"] == ["a"]


def test_name_maps_survive_expire_consolidation(spark, warehouse):
    # expire_snapshots rewrites surviving manifests (consolidation);
    # the carried files' name->field-id maps must re-record, or the
    # reuse table would silently demote to name-based resolution
    t = SnapshotTable.create(spark, os.path.join(warehouse, "expfid"))
    t.append(_df(spark, [(1, "old1")]), committed_at=1_000)
    t.rename_column("a", "b")
    t.add_column("a", "string")
    t.append(
        spark.createDataFrame(
            [(2, "old2", "new2")], "id long, b string, a string"
        ).coalesce(1),
        committed_at=2_000,
    )
    t.append(
        spark.createDataFrame(
            [(3, "old3", "new3")], "id long, b string, a string"
        ).coalesce(1),
        committed_at=9_000,
    )
    t.expire_snapshots(5_000)  # expires the first two snapshots
    rows = {r.id: (r.b, r.a) for r in t.scan(virtual_column=None).collect()}
    assert rows == {
        1: ("old1", None),
        2: ("old2", "new2"),
        3: ("old3", "new3"),
    }


def test_describe_extended_shows_field_ids(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = SnapshotTable.create(spark, os.path.join(warehouse, "descfid"))
    t.append(_df(spark, [(1, "x")]))
    t.rename_column("a", "b")
    t.add_column("a", "string")
    rows = execute_sql(spark, warehouse, "DESCRIBE EXTENDED descfid").collect()
    fids = {r.col_name: r.data_type for r in rows if r.kind == "field_id"}
    assert fids == {"id": "1", "b": "2", "a": "3"}


def test_mapped_scan_preserves_pushdown(spark, warehouse):
    # the id-mapped read groups must not cost the headline DSv2
    # optimizations: filters and projection still reach the parquet scan
    from pyspark.sql import functions as F

    from hiveberg_spark.plans import pushed_filters, read_schema_columns

    t = SnapshotTable.create(spark, os.path.join(warehouse, "pushfid"))
    t.append(_df(spark, [(i, f"r{i}") for i in range(100)]))
    t.rename_column("a", "b")
    t.add_column("a", "string")
    df = t.scan(virtual_column=None).filter(F.col("id") > 50).select("id")
    assert any("id" in f for f in pushed_filters(df))
    assert all(cols == ["id"] for cols in read_schema_columns(df))


def test_targeted_compaction_rewrites_only_matching_files(spark, warehouse):
    # compact(where=...) — Iceberg rewrite_data_files(filter): only
    # files that might match are rewritten; the rest carry by path
    # with lineage intact, and contents never change
    t = SnapshotTable.create(spark, os.path.join(warehouse, "tcmp"))
    for lo in (0, 100, 200):
        for part in range(3):  # fragment each key range across files
            t.append(
                _df(
                    spark,
                    [(i, f"v{i}") for i in range(lo + part * 10, lo + part * 10 + 10)],
                )
            )
    before_files = set(t.plan_files())
    before = sorted(
        tuple(r) for r in t.scan(virtual_column=None).collect()
    )
    rid_before = {
        r.id: r._row_id for r in t.scan_with_row_lineage().collect()
    }
    t.compact(where="id < 100")  # only the 0-29 range fragments match
    after_files = set(t.plan_files())
    after = sorted(tuple(r) for r in t.scan(virtual_column=None).collect())
    assert after == before
    untouched = {f for f in before_files if f in after_files}
    # the non-matching ranges' files carried by reference (same paths)
    assert len(untouched) == 6
    assert len(after_files) < len(before_files)
    # row identity preserved through the targeted rewrite
    rid_after = {
        r.id: r._row_id for r in t.scan_with_row_lineage().collect()
    }
    assert rid_after == rid_before


def test_sql_rewrite_data_files_filter(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = SnapshotTable.create(spark, os.path.join(warehouse, "sqlrw"))
    for i in range(4):
        t.append(_df(spark, [(i * 10 + j, "x") for j in range(10)]))
    before = t.scan(virtual_column=None).count()
    n_files_before = len(t.plan_files())
    execute_sql(
        spark, warehouse, "CALL system.rewrite_data_files('sqlrw', 'id < 20')"
    )
    assert t.scan(virtual_column=None).count() == before
    assert len(t.plan_files()) < n_files_before


def test_field_id_resolution_random_churn_vs_model(spark, warehouse):
    """Randomized sequences of append / rename / add(+reuse) / COW
    delete / compact (full + targeted) checked against a pure-Python
    model of the logical table — the same churn-model pattern the DV
    and row-id suites use. Columns evolve by (stable) field identity in
    the model; any divergence means the per-file map resolution broke."""
    import random

    rng = random.Random(0xF1E1D)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "fidchurn"), schema="id long, c1 string"
    )
    # model: rows[id] = {field_id: value}; fields: list of (fid, name)
    fields = [(1, "id"), (2, "c1")]
    next_fid = 3  # mirrors meta["next_field_id"]
    rows: dict[int, dict[int, str]] = {}
    next_id = 0
    freed: set[str] = set()

    def live_names():
        return [n for _, n in fields]

    def append(n):
        nonlocal next_id
        names = live_names()
        batch = []
        for _ in range(n):
            vals = {1: next_id}
            for fid, nm in fields:
                if nm == "id":
                    continue
                vals[fid] = f"{nm}_v{next_id}"
            rows[next_id] = vals
            batch.append(
                tuple(
                    next_id if nm == "id" else vals[fid]
                    for fid, nm in fields
                )
            )
            next_id += 1
        schema = ", ".join(
            f"{nm} long" if nm == "id" else f"{nm} string"
            for _, nm in fields
        )
        t.append(spark.createDataFrame(batch, schema).coalesce(1))

    append(3)
    for step in range(12):
        op = rng.choice(["append", "rename", "add", "cow_del", "compact"])
        if op == "append" or not rows:
            append(rng.randint(1, 3))
        elif op == "rename":
            cands = [(f, n) for f, n in fields if n != "id"]
            if not cands:
                continue
            fid, old = rng.choice(cands)
            new = f"r{step}_{old[:8]}"
            t.rename_column(old, new)
            fields[:] = [
                (f, new if f == fid else n) for f, n in fields
            ]
            freed.add(old)
        elif op == "add":
            name = (
                rng.choice(sorted(freed)) if freed and rng.random() < 0.5
                else f"n{step}"
            )
            if name in live_names():
                continue
            t.add_column(name, "string")
            fields.append((next_fid, name))
            next_fid += 1
            freed.discard(name)
        elif op == "cow_del":
            victim = rng.choice(sorted(rows))
            t.delete_where(f"id = {victim}")
            del rows[victim]
        else:
            if rng.random() < 0.5 and rows:
                pivot = rng.choice(sorted(rows))
                t.compact(where=f"id >= {pivot}")
            else:
                t.compact()
        got = {
            r["id"]: {
                nm: r[nm] for _, nm in fields if nm != "id"
            }
            for r in (
                x.asDict() for x in t.scan(virtual_column=None).collect()
            )
        }
        expect = {
            i: {
                nm: vals.get(fid)
                for fid, nm in fields
                if nm != "id"
            }
            for i, vals in rows.items()
        }
        assert got == expect, f"diverged at step {step} after {op}"
