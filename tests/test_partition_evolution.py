"""Partition spec evolution (Iceberg UpdatePartitionSpec): new writes
cluster under the new spec, old files keep their layout, and pruning
evaluates each file against the spec generation that wrote it."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _rows(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, data string")


def test_spec_change_is_metadata_only_and_scan_reads_both(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "ev"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(8)))
    before = {rel for rel, _, _ in t._raw_entries_as_of(t._read_meta(), 1)}
    t.update_partition_spec([("bucket", "id", 8)])
    t.append(_rows(spark, range(8, 16)))
    # old files untouched by the evolution
    now = {rel for rel, _, _ in t._raw_entries_as_of(t._read_meta(), 2)}
    assert before <= now
    assert sorted(r.id for r in t.scan().collect()) == list(range(16))


def test_mixed_spec_bucket_pruning_per_generation(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "prune"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(32)))
    t.update_partition_spec([("bucket", "id", 8)])
    t.append(_rows(spark, range(32, 64)))
    def buckets(files, gen):
        return {
            seg for f in files for seg in f.split(os.sep)
            if seg.startswith(f"_p_id_bucket{gen}=")
        }

    all_files = t.plan_files()
    assert len(buckets(all_files, 4)) == 4
    assert len(buckets(all_files, 8)) == 8
    # a key living in the OLD generation: one bucket4 dir survives,
    # every new-generation file is excluded outright by min/max stats
    planned_old = t.plan_files("id = 7")
    assert len(buckets(planned_old, 4)) == 1
    assert len(buckets(planned_old, 8)) == 0
    # a key living in the NEW generation: the mirror image
    planned_new = t.plan_files("id = 39")
    assert len(buckets(planned_new, 8)) == 1
    assert len(buckets(planned_new, 4)) == 0
    # and correctness is unaffected
    assert [r.id for r in t.scan_where("id = 7").collect()] == [7]
    assert [r.id for r in t.scan_where("id = 39").collect()] == [39]


def test_evolve_to_unpartitioned(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "unp"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(8)))
    t.update_partition_spec(None)
    t.append(_rows(spark, range(8, 12)).coalesce(1))
    # old-generation files still prune on equality
    planned = t.plan_files("id = 0")
    old_dirs = {
        seg for f in planned for seg in f.split(os.sep)
        if seg.startswith("_p_id_bucket4=")
    }
    assert len(old_dirs) == 1
    assert sorted(r.id for r in t.scan().collect()) == list(range(12))


def test_spec_history_survives_source_rename(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "ren"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(16)))
    t.update_partition_spec([("bucket", "id", 8)])
    t.append(_rows(spark, range(16, 32)))
    t.rename_column("id", "ident")
    # pruning still hits both generations via the rename log (each
    # probe key lives in one generation; the other generation's files
    # are stats-pruned outright)
    def dirs(files, prefix):
        return {
            seg for f in files for seg in f.split(os.sep)
            if seg.startswith(prefix)
        }

    planned_old = t.plan_files("ident = 3")
    assert len(dirs(planned_old, "_p_id_bucket4=")) == 1
    planned_new = t.plan_files("ident = 19")
    assert len(dirs(planned_new, "_p_id_bucket8=")) == 1
    assert len(dirs(planned_new, "_p_id_bucket4=")) == 0
    assert [r.ident for r in t.scan_where("ident = 3").collect()] == [3]
    # dropping a source column of ANY live spec generation refuses
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("ident")


def test_compact_migrates_layout_to_current_spec(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "mig"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(16)))
    t.update_partition_spec([("identity", "data", None)])
    t.compact()
    # post-compaction files live under the NEW spec's directories
    live = [rel for rel, _, _ in t._raw_entries_as_of(
        t._read_meta(), t._read_meta()["current_snapshot_id"]
    )]
    assert all("_p_data=" in f for f in live)
    assert sorted(r.id for r in t.scan().collect()) == list(range(16))


def test_spec_change_composes_with_mor_delete(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "mor"),
        schema="id long, data string",
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(_rows(spark, range(8)))
    t.update_partition_spec([("bucket", "id", 8)])
    t.append(_rows(spark, range(8, 16)))
    t.delete_where("id = 3 OR id = 12", mode="merge-on-read")
    got = sorted(r.id for r in t.scan().collect())
    assert got == [i for i in range(16) if i not in (3, 12)]


def test_unknown_transform_rejected(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "bad"))
    with pytest.raises(ValueError, match="unknown partition transform"):
        t.update_partition_spec([("decade", "ts", None)])
