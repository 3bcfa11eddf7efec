"""Iceberg v3 DELETION VECTORS (`write.delete.vectors=true`):
merge-on-read position deletes as per-data-file bitmaps carried in the
manifest — no standalone delete files, one DV per file with every
write merging the prior bitmap (the v3 invariant), metadata-only
deleted-row counts. The reference's Iceberg 0.7 predates the feature;
the contract followed is the public v3 spec (deletion-vectors
section), with the bitmap living in the manifest instead of a puffin
sidecar."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.sources.snapshot_table import (
    SnapshotTable,
    _dv_decode,
    _dv_encode,
)


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _dv_table(spark, warehouse, name, rows=8):
    t = SnapshotTable.create(spark, os.path.join(warehouse, name))
    t.set_properties(
        {"write.delete.mode": "merge-on-read", "write.delete.vectors": "true"}
    )
    t.append(
        spark.createDataFrame(
            [(i, f"d{i}") for i in range(rows)], "id long, data string"
        ).coalesce(1)
    )
    return t


def test_dv_roundtrip_encode_decode():
    for ps in ([], [0], [7], [8], [0, 1, 63, 64, 1000], list(range(100))):
        b64, n = _dv_encode(ps)
        assert _dv_decode(b64) == sorted(set(ps))
        assert n == len(set(ps))


def test_dv_delete_writes_no_files(spark, warehouse):
    t = _dv_table(spark, warehouse, "nf")
    t.delete_where("id = 3")
    assert not os.path.isdir(os.path.join(t.location, "deletes"))
    assert sorted(r.id for r in t.scan().collect()) == [0, 1, 2, 4, 5, 6, 7]
    # metadata-only COUNT(*) subtracts the DV cardinality
    assert t.count_rows() == 7
    # the files table surfaces the DV as a content row
    dv_rows = t.files().filter(F.col("file_format") == "dv").collect()
    assert len(dv_rows) == 1 and dv_rows[0].record_count == 1


def test_dv_merges_one_per_file(spark, warehouse):
    t = _dv_table(spark, warehouse, "merge")
    t.delete_where("id IN (1, 2)")
    t.delete_where("id = 5")
    meta = t._read_meta()
    dels = t._raw_deletes_as_of(meta, meta["current_snapshot_id"])
    assert all(d["type"] == "dv" for d in dels)
    # the NEWEST entry carries the merged bitmap (1, 2, 5)
    assert dels[-1]["count"] == 3
    assert sorted(r.id for r in t.scan().collect()) == [0, 3, 4, 6, 7]
    assert t.count_rows() == 5
    # position_deletes lists every live tombstone from the bitmap
    pd_rows = t.position_deletes().collect()
    assert len(pd_rows) == 3
    assert all(r.delete_file_path.startswith("dv:") for r in pd_rows)


def test_dv_time_travel(spark, warehouse):
    t = _dv_table(spark, warehouse, "tt")
    s1 = t.delete_where("id = 0")
    t.delete_where("id = 1")
    assert sorted(r.id for r in t.scan(snapshot_id=s1).collect()) == list(
        range(1, 8)
    )
    assert sorted(r.id for r in t.scan().collect()) == list(range(2, 8))


def test_dv_mor_update(spark, warehouse):
    t = _dv_table(spark, warehouse, "upd")
    t.set_properties({"write.update.mode": "merge-on-read"})
    t.update_where("id = 2", {"data": "'x'"})
    rows = {r.id: r.data for r in t.scan().collect()}
    assert rows[2] == "x" and len(rows) == 8
    assert not os.path.isdir(os.path.join(t.location, "deletes"))


def test_dv_changelog_emits_only_delta(spark, warehouse):
    t = _dv_table(spark, warehouse, "ch")
    s0 = t._read_meta()["current_snapshot_id"]
    s1 = t.delete_where("id IN (1, 2)")
    t.delete_where("id = 5")
    ch = t.scan_changelog(s0).orderBy("id").collect()
    assert [(r._change_type, r.id, r._commit_snapshot_id) for r in ch] == [
        ("delete", 1, s1),
        ("delete", 2, s1),
        ("delete", 5, s1 + 1),
    ]


def test_dv_rewrite_migrates_both_directions(spark, warehouse):
    # start WITHOUT vectors: parquet delete files accumulate
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mig"))
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(
        spark.createDataFrame(
            [(i, f"d{i}") for i in range(8)], "id long, data string"
        ).coalesce(1)
    )
    t.delete_where("id = 1")
    t.delete_where("id = 2")
    meta = t._read_meta()
    assert any(
        d["type"] == "position"
        for d in t._raw_deletes_as_of(meta, meta["current_snapshot_id"])
    )
    # enable vectors and consolidate: files fold into per-file DVs
    t.set_properties({"write.delete.vectors": "true"})
    t.rewrite_position_deletes()
    meta = t._read_meta()
    dels = t._raw_deletes_as_of(meta, meta["current_snapshot_id"])
    assert [d["type"] for d in dels] == ["dv"]
    assert dels[0]["count"] == 2
    assert sorted(r.id for r in t.scan().collect()) == [0, 3, 4, 5, 6, 7]
    # disable and consolidate back: the DV becomes one delete file
    t.set_properties({"write.delete.vectors": "false"})
    t.rewrite_position_deletes()
    meta = t._read_meta()
    dels = t._raw_deletes_as_of(meta, meta["current_snapshot_id"])
    assert [d["type"] for d in dels] == ["position"]
    assert sorted(r.id for r in t.scan().collect()) == [0, 3, 4, 5, 6, 7]


def test_dv_cow_rewrite_materializes(spark, warehouse):
    t = _dv_table(spark, warehouse, "cow")
    t.delete_where("id = 1")  # DV
    t.delete_where("id = 2", mode="copy-on-write")  # rewrites the file
    assert sorted(r.id for r in t.scan().collect()) == [0, 3, 4, 5, 6, 7]
    # compaction folds everything; no deletes remain
    t.compact()
    meta = t._read_meta()
    assert t._raw_deletes_as_of(meta, meta["current_snapshot_id"]) == []
    assert sorted(r.id for r in t.scan().collect()) == [0, 3, 4, 5, 6, 7]


def test_dv_row_lineage_composes(spark, warehouse):
    t = _dv_table(spark, warehouse, "rl")
    t.delete_where("id = 3")
    rows = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert rows == {i: i for i in range(8) if i != 3}


def test_dv_model_based_random_ops(spark, warehouse):
    import random

    rng = random.Random(0xD37EC7)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "model"), schema="id long, data string"
    )
    t.set_properties(
        {"write.delete.mode": "merge-on-read", "write.delete.vectors": "true"}
    )
    model: dict[int, str] = {}
    next_id = 0
    for step in range(14):
        op = rng.choice(
            ["append", "dv_del", "dv_del", "cow_del", "compact", "rewrite"]
        )
        if op == "append" or not model:
            n = rng.randint(1, 3)
            rows = [(i, f"v{step}") for i in range(next_id, next_id + n)]
            next_id += n
            t.append(
                spark.createDataFrame(rows, "id long, data string").coalesce(1)
            )
            model.update({i: v for i, v in rows})
        elif op == "dv_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}")
            del model[victim]
        elif op == "cow_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}", mode="copy-on-write")
            del model[victim]
        elif op == "compact":
            t.compact()
        else:
            t.rewrite_position_deletes()
        got = {(r.id, r.data) for r in t.scan(virtual_column=None).collect()}
        assert got == set(model.items()), f"diverged at step {step}"
        assert t.count_rows() == len(model)


def test_dv_distributed_decode_tier_equivalent(spark, warehouse, monkeypatch):
    # heavy DV waves decode on executors (driver never materializes
    # O(deleted) positions); the tier switch must not change results
    import hiveberg_spark.sources.snapshot_table as st_mod

    t = _dv_table(spark, warehouse, "tier", rows=20)
    t.delete_where("id % 3 = 1", mode="merge-on-read")
    t.delete_where("id % 5 = 2", mode="merge-on-read")
    expect = {r.id for r in t.scan(virtual_column=None).collect()}
    monkeypatch.setattr(st_mod, "_DV_DRIVER_DECODE_MAX", 0)
    got = {r.id for r in t.scan(virtual_column=None).collect()}
    assert got == expect
    assert expect == {
        i for i in range(20) if i % 3 != 1 and i % 5 != 2
    }
