"""Manifest-resident bloom file-skip index
(`write.metadata.bloom-filter-columns`): plan-time FILE pruning for
high-cardinality equality probes where min/max bounds are too coarse
(interleaved keys across files) and no value index is maintained. The
Iceberg analog is engine-side evaluation of parquet bloom filters /
puffin blobs; the reference (Iceberg 0.7) predates both."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import hiveberg_spark.sources.snapshot_table as st_mod
from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _interleaved(spark, warehouse, name, n=100, files=4, fmt="parquet"):
    """`files` data files whose id sets interleave (file i holds ids with
    id % files == i): every file's [min, max] spans nearly the whole key
    range, so min/max pruning keeps ALL files for any interior probe."""
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, name), file_format=fmt
    )
    t.set_properties({"write.metadata.bloom-filter-columns": "id"})
    for i in range(files):
        t.append(
            spark.createDataFrame(
                [(v, f"d{v}") for v in range(n) if v % files == i],
                "id long, data string",
            ).coalesce(1)
        )
    return t


def test_bloom_prunes_interleaved_files(spark, warehouse):
    t = _interleaved(spark, warehouse, "bl")
    total = t.plan_files()
    assert len(total) == 4
    # probe an interior key: min/max keeps all 4 files, the bloom keeps
    # only the one holding it (deterministic: xxhash64 is seeded)
    kept = t.plan_files("id = 42")
    assert len(kept) == 1
    rows = t.scan_where("id = 42").collect()
    assert [r.id for r in rows] == [42]


def test_bloom_soundness_every_key(spark, warehouse):
    # no probe may lose its row (false positives keep files; a false
    # NEGATIVE would be a wrong answer) — checked for every key
    t = _interleaved(spark, warehouse, "sound", n=40)
    for v in range(40):
        assert t.scan_where(f"id = {v}").count() == 1, v
    # absent keys: zero rows, and typically zero files
    assert t.scan_where("id = 4242").count() == 0


def test_bloom_absent_key_prunes_everything(spark, warehouse):
    t = _interleaved(spark, warehouse, "absent")
    assert t.plan_files("id = 123456") == []


def test_bloom_orc_and_unbloomed_columns(spark, warehouse):
    t = _interleaved(spark, warehouse, "orc", fmt="orc")
    assert len(t.plan_files("id = 42")) == 1
    assert t.scan_where("id = 42").count() == 1
    # a column outside the property never prunes via blooms
    assert len(t.plan_files("data = 'd42'")) >= 1
    assert t.scan_where("data = 'd42'").count() == 1


def test_bloom_survives_cow_carry_and_rename(spark, warehouse):
    t = _interleaved(spark, warehouse, "carry")
    # COW delete rewrites one file; the other three carry their bitsets
    t.delete_where("id = 1")
    kept = t.plan_files("id = 42")
    assert len(kept) == 1
    assert t.scan_where("id = 42").count() == 1
    # rename: probe under the NEW name resolves to bitsets recorded
    # under the written name via the rename log
    t.rename_column("id", "key")
    t.set_properties({"write.metadata.bloom-filter-columns": "key"})
    assert len(t.plan_files("key = 42")) == 1
    assert t.scan_where("key = 42").count() == 1


def test_bloom_pre_property_files_never_prune(spark, warehouse):
    # files written BEFORE the property have no bitsets: conservative
    t = SnapshotTable.create(spark, os.path.join(warehouse, "pre"))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string")
        .coalesce(1)
    )
    t.set_properties({"write.metadata.bloom-filter-columns": "id"})
    t.append(spark.createDataFrame([(3, "c")], "id long, data string").coalesce(1))
    # probe for 1: the old (unbloomed) file must survive, the new
    # bloomed file prunes
    kept = t.plan_files("id = 1")
    assert len(kept) == 1
    assert t.scan_where("id = 1").count() == 1


def test_bloom_widened_column_skipped(spark, warehouse):
    # widening changes the hashed physical type: bitsets predating the
    # widening would false-exclude — the probe must skip blooms
    t = SnapshotTable.create(spark, os.path.join(warehouse, "wide"))
    t.set_properties({"write.metadata.bloom-filter-columns": "id"})
    t.append(
        spark.createDataFrame(
            [(v, f"d{v}") for v in range(10)], "id int, data string"
        ).coalesce(1)
    )
    t.widen_column("id", "long")
    assert len(t.plan_files("id = 5")) == 1  # kept: no bloom exclusion
    assert t.scan_where("id = 5").count() == 1


def test_bloom_nulls_contribute_no_bits(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "nulls"))
    t.set_properties({"write.metadata.bloom-filter-columns": "id"})
    t.append(
        spark.createDataFrame(
            [(None, "x"), (None, "y")], "id long, data string"
        ).coalesce(1)
    )
    t.append(spark.createDataFrame([(7, "z")], "id long, data string").coalesce(1))
    # equality never matches NULL: the nulls-only file prunes
    assert len(t.plan_files("id = 7")) == 1
    assert t.scan_where("id = 7").count() == 1
    assert t.scan_where("id IS NULL").count() == 2


def test_bloom_distributed_planning_equivalence(spark, warehouse, monkeypatch):
    t = _interleaved(spark, warehouse, "dist")
    driver = t.plan_files("id = 42")
    monkeypatch.setattr(st_mod, "_DISTRIBUTED_PLAN_THRESHOLD", 0)
    assert sorted(t.plan_files("id = 42")) == sorted(driver)
    assert t.scan_where("id = 42").count() == 1


def test_bloom_files_table_excludes_reserved_key(spark, warehouse):
    t = _interleaved(spark, warehouse, "meta")
    bounds = t.files().select("lower_bounds").collect()
    assert all("__bloom__" not in r.lower_bounds for r in bounds)


def test_bloom_in_list_pruning(spark, warehouse):
    t = _interleaved(spark, warehouse, "inlist")
    # members live in files (42%4=2) and (43%4=3): exactly 2 files kept
    kept = t.plan_files("id IN (42, 43)")
    assert len(kept) == 2
    got = sorted(r.id for r in t.scan_where("id IN (42, 43)").collect())
    assert got == [42, 43]
    # all-absent IN list prunes everything
    assert t.plan_files("id IN (1042, 2042)") == []
    # mixed present/absent keeps only the present member's file
    assert len(t.plan_files("id IN (42, 9999)")) == 1
    assert [r.id for r in t.scan_where("id IN (42, 9999)").collect()] == [42]


def test_bloom_in_list_distributed_equivalence(spark, warehouse, monkeypatch):
    t = _interleaved(spark, warehouse, "indist")
    driver = t.plan_files("id IN (10, 11)")
    monkeypatch.setattr(st_mod, "_DISTRIBUTED_PLAN_THRESHOLD", 0)
    assert sorted(t.plan_files("id IN (10, 11)")) == sorted(driver)


def test_bloom_widen_then_rename_still_skipped(spark, warehouse):
    # ADVICE r5: rename_column must rewrite the widenings log (or the
    # probe would hash the wide type under the NEW name against
    # pre-widening narrow-type bitsets and falsely prune the file)
    t = SnapshotTable.create(spark, os.path.join(warehouse, "widern"))
    t.set_properties({"write.metadata.bloom-filter-columns": "id"})
    t.append(
        spark.createDataFrame(
            [(v, f"d{v}") for v in range(10)], "id int, data string"
        ).coalesce(1)
    )
    t.widen_column("id", "long")
    t.rename_column("id", "key")
    t.set_properties({"write.metadata.bloom-filter-columns": "key"})
    assert t._read_meta()["widenings"][0]["col"] == "key"
    assert len(t.plan_files("key = 5")) == 1  # kept: no bloom exclusion
    assert t.scan_where("key = 5").count() == 1
