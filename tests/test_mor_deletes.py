"""Merge-on-read deletes (Iceberg v2 position + equality delete files).

The reference is a read-only Iceberg 0.7 connector with no delete-file
support at all (its format_version is pre-v2); this surface models what
its successor (the Hive support merged into Apache Iceberg >= 0.10)
gained with v2 tables: row-level deletes that write O(changed rows)
delete files instead of rewriting data — the only viable shape for
small deletes on a 100 TB table. Scan-side application is one anti-join
per delete kind; sequence numbers scope equality deletes exactly as
Iceberg's data-sequence-number rules do.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _simple_df(spark, rows):
    # one file per append (createDataFrame otherwise spreads rows over
    # partitions), so file-count assertions are deterministic
    return spark.createDataFrame(rows, "id long, data string").coalesce(1)


def _live_data_files(t):
    meta = t._read_meta()
    return sorted(
        rel for rel, _, _ in t._raw_entries_as_of(meta, meta["current_snapshot_id"])
    )


def _live_deletes(t):
    meta = t._read_meta()
    return t._raw_deletes_as_of(meta, meta["current_snapshot_id"])


def test_mor_delete_removes_rows_without_touching_data_files(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mor"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.append(_simple_df(spark, [(3, "c"), (4, "d")]))
    before = _live_data_files(t)
    t.delete_where("id = 2", mode="merge-on-read")
    # no data file rewritten, one position delete file recorded
    assert _live_data_files(t) == before
    dels = _live_deletes(t)
    assert [d["type"] for d in dels] == ["position"]
    assert dels[0]["count"] == 1
    assert sorted(r.id for r in t.scan().collect()) == [1, 3, 4]
    # the delete commit is a snapshot like any other
    snap = t.snapshots().filter("operation = 'delete'").collect()[0]
    assert snap.summary["delete-mode"] == "merge-on-read"
    assert snap.summary["added-delete-files"] == "1"
    assert snap.summary["added-delete-records"] == "1"


def test_mor_delete_time_travel_sees_predelete_rows(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "tt"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    sid = t.delete_where("id = 1", mode="merge-on-read")
    assert sorted(r.id for r in t.scan(snapshot_id=sid - 1).collect()) == [1, 2]
    assert sorted(r.id for r in t.scan(snapshot_id=sid).collect()) == [2]


def test_mor_delete_is_idempotent(spark, warehouse):
    # rows already deleted are not re-recorded: the second delete
    # commits with ZERO delete files (the lineage read applies the
    # first delete before matching)
    t = SnapshotTable.create(spark, os.path.join(warehouse, "idem"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where("id = 1", mode="merge-on-read")
    t.delete_where("id = 1", mode="merge-on-read")
    dels = _live_deletes(t)
    assert len(dels) == 1  # second commit added nothing
    assert sorted(r.id for r in t.scan().collect()) == [2]


def test_mor_update_one_commit_delete_plus_append(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "upd"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    before = _live_data_files(t)
    sid = t.update_where("id = 1", {"data": "'A'"}, mode="merge-on-read")
    # old files untouched, ONE new data file holds the updated row
    after = _live_data_files(t)
    assert set(before) <= set(after) and len(after) == len(before) + 1
    assert [d["type"] for d in _live_deletes(t)] == ["position"]
    rows = {r.id: r.data for r in t.scan().collect()}
    assert rows == {1: "A", 2: "b"}
    snap = t.snapshots().filter(f"snapshot_id = {sid}").collect()[0]
    assert snap.summary["update-mode"] == "merge-on-read"
    # exactly one commit for the whole update
    assert snap.operation == "update"


def test_mor_update_null_predicate_rows_survive_unchanged(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "updnull"))
    df = spark.createDataFrame([(1, None), (2, 5)], "id long, v int")
    t.append(df)
    t.update_where("v > 1", {"v": "v * 10"}, mode="merge-on-read")
    rows = {r.id: r.v for r in t.scan().collect()}
    assert rows == {1: None, 2: 50}


def test_equality_delete_scoped_by_sequence_number(spark, warehouse):
    # Iceberg v2 semantics: an equality delete applies only to rows
    # from files sealed BEFORE it — re-inserting the key later survives
    t = SnapshotTable.create(spark, os.path.join(warehouse, "eq"))
    t.append(_simple_df(spark, [(1, "old"), (2, "keep")]))
    t.delete_by_keys(spark.createDataFrame([(1,)], "id long"))
    assert sorted(r.id for r in t.scan().collect()) == [2]
    t.append(_simple_df(spark, [(1, "new")]))
    rows = {r.id: r.data for r in t.scan().collect()}
    assert rows == {1: "new", 2: "keep"}
    # and the delete still applies to the OLD file when time traveling
    # to any snapshot at or after the delete
    dels = _live_deletes(t)
    assert [d["type"] for d in dels] == ["equality"]
    assert dels[0]["cols"] == ["id"]


def test_equality_delete_multi_column_and_nulls(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "eqm"))
    df = spark.createDataFrame(
        [(1, "x", 10), (1, None, 20), (2, "x", 30)], "a long, b string, v int"
    )
    t.append(df)
    # null-safe match: (1, NULL) deletes the row with b IS NULL
    t.delete_by_keys(spark.createDataFrame([(1, None)], "a long, b string"))
    rows = sorted((r.a, r.b) for r in t.scan().collect())
    assert rows == [(1, "x"), (2, "x")]


def test_equality_delete_unknown_column_rejected(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "eqbad"))
    t.append(_simple_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="unknown equality-delete columns"):
        t.delete_by_keys(spark.createDataFrame([(1,)], "nope long"))


def test_cow_delete_composes_with_live_mor_deletes(spark, warehouse):
    # a COW rewrite of SOME files must (a) apply live MOR deletes to the
    # files it rewrites and (b) carry the delete entries for the files
    # it does not touch
    t = SnapshotTable.create(spark, os.path.join(warehouse, "compose"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))   # file A
    t.append(_simple_df(spark, [(10, "x"), (11, "y")]))  # file B
    t.delete_where("id = 2", mode="merge-on-read")       # hits file A
    t.delete_where("id = 10", mode="merge-on-read")      # hits file B
    # COW delete targets file A only (min/max pruning keeps B carried)
    t.delete_where("id = 1")  # copy-on-write
    assert sorted(r.id for r in t.scan().collect()) == [11]
    # file B still carried with its position delete applied via carry
    dels = _live_deletes(t)
    assert len(dels) == 2  # both entries carried (A's is now inert)


def test_compact_materializes_mor_deletes(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cmp"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.append(_simple_df(spark, [(3, "c")]))
    t.delete_by_keys(spark.createDataFrame([(3,)], "id long"))
    t.delete_where("id = 1", mode="merge-on-read")
    t.compact()
    assert _live_deletes(t) == []  # debt folded into the rewrite
    assert sorted(r.id for r in t.scan().collect()) == [2]


def test_rewrite_position_deletes_consolidates_and_drops_dead_refs(
    spark, warehouse
):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "rpd"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))    # file A
    t.append(_simple_df(spark, [(10, "x"), (11, "y")]))   # file B
    t.delete_where("id = 1", mode="merge-on-read")
    t.delete_where("id = 10", mode="merge-on-read")
    assert len(_live_deletes(t)) == 2
    # COW-rewrite file A (its position delete entry goes stale)
    t.update_where("id = 2", {"data": "'B'"})
    t.rewrite_position_deletes()
    dels = _live_deletes(t)
    assert len(dels) == 1 and dels[0]["type"] == "position"
    # only the entry for still-live file B survived
    assert dels[0]["count"] == 1
    rows = {r.id: r.data for r in t.scan().collect()}
    assert rows == {2: "B", 11: "y"}


def test_rollback_preserves_mor_delete_state(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "rb"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    del_sid = t.delete_where("id = 1", mode="merge-on-read")
    t.append(_simple_df(spark, [(9, "z")]))
    t.rollback_to(del_sid)
    # the rollback target had the delete applied; it must stay applied
    assert sorted(r.id for r in t.scan().collect()) == [2]


def test_scan_changes_refuses_crossing_mor_delete(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cdc"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.delete_where("id = 1", mode="merge-on-read")
    t.append(_simple_df(spark, [(2, "b")]))
    with pytest.raises(ValueError, match="append-only"):
        t.scan_changes(1, 3)


def test_expire_gc_keeps_live_delete_files_and_removes_orphaned(
    spark, warehouse
):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "gc"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]), committed_at=1000)
    t.delete_where("id = 1", mode="merge-on-read", committed_at=2000)
    live_del = _live_deletes(t)[0]["path"]
    # compaction materializes the delete; the delete FILE is then only
    # referenced by historical snapshots
    t.compact(committed_at=3000)
    assert os.path.exists(os.path.join(t.location, live_del))
    res = t.expire_snapshots(older_than_ms=4000)
    assert res["expired_snapshots"] > 0
    # orphaned delete file physically removed with the history
    assert not os.path.exists(os.path.join(t.location, live_del))
    assert sorted(r.id for r in t.scan().collect()) == [2]


def test_expire_consolidation_preserves_mor_state(spark, warehouse):
    # survivors whose lineage crosses expired manifests are
    # consolidated; the rewritten manifest must re-record delete
    # entries and sequence numbers, or deleted rows resurrect
    t = SnapshotTable.create(spark, os.path.join(warehouse, "gc2"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]), committed_at=1000)
    t.delete_where("id = 1", mode="merge-on-read", committed_at=2000)
    t.append(_simple_df(spark, [(3, "c")]), committed_at=5000)
    res = t.expire_snapshots(older_than_ms=1500)  # expires only the append
    assert res["expired_snapshots"] == 1
    assert sorted(r.id for r in t.scan().collect()) == [2, 3]
    assert len(_live_deletes(t)) == 1


def test_mor_delete_on_hidden_partitioned_table(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "part"),
        schema="id long, region string, v int",
        partition_spec=[("identity", "region", None)],
    )
    df = spark.createDataFrame(
        [(1, "eu", 10), (2, "eu", 20), (3, "us", 30)],
        "id long, region string, v int",
    )
    t.append(df)
    t.delete_where("id = 2", mode="merge-on-read")
    rows = sorted((r.id, r.region) for r in t.scan().collect())
    assert rows == [(1, "eu"), (3, "us")]
    # MOR update writes the new row through the partition transforms
    t.update_where("id = 3", {"v": "v + 1"}, mode="merge-on-read")
    assert {r.v for r in t.scan().filter("id = 3").collect()} == {31}


def test_mor_scan_where_pruning_still_applies_deletes(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "prune"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.append(_simple_df(spark, [(100, "x"), (101, "y")]))
    t.delete_where("id = 100", mode="merge-on-read")
    got = sorted(r.id for r in t.scan_where("id >= 100").collect())
    assert got == [101]


def test_mor_rejected_on_avro_tables(spark, warehouse):
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "av"), file_format="avro"
    )
    t.append(_simple_df(spark, [(1, "a")]))
    with pytest.raises(NotImplementedError, match="parquet"):
        t.delete_where("id = 1", mode="merge-on-read")
    with pytest.raises(NotImplementedError, match="avro"):
        t.delete_by_keys(spark.createDataFrame([(1,)], "id long"))


def test_mor_delete_on_branch_wap(spark, warehouse):
    # write-audit-publish with MOR DML: the delete lands on the branch,
    # main is untouched until fast_forward
    t = SnapshotTable.create(spark, os.path.join(warehouse, "wap"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.create_branch("audit")
    t.delete_where("id = 1", mode="merge-on-read", branch="audit")
    assert sorted(r.id for r in t.scan().collect()) == [1, 2]  # main intact
    assert sorted(r.id for r in t.scan(ref="audit").collect()) == [2]
    t.fast_forward("audit")
    assert sorted(r.id for r in t.scan().collect()) == [2]


def test_files_metadata_table_lists_delete_files(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "meta"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where("id = 1", mode="merge-on-read")
    t.delete_by_keys(spark.createDataFrame([(2,)], "id long"))
    by_content = {
        r.content: r for r in t.files().collect()
    }
    assert set(by_content) == {"data", "position-deletes", "equality-deletes"}
    assert by_content["position-deletes"].record_count == 1
    assert by_content["equality-deletes"].record_count == 1


def test_mor_update_after_rename_evolution(spark, warehouse):
    # position deletes written before a rename keep applying (they key
    # on file/pos, not names); equality deletes resolve through the
    # rename log
    t = SnapshotTable.create(spark, os.path.join(warehouse, "ren"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.delete_by_keys(spark.createDataFrame([(1,)], "id long"))
    t.rename_column("id", "ident")
    assert sorted(r.ident for r in t.scan().collect()) == [2]


def test_mor_table_survives_directory_move(spark, tmp_path):
    # manifests store location-relative paths so a table can be moved
    # wholesale (build-then-rename fixtures, storage migration);
    # position delete files must record relative paths too or they go
    # stale on the first move — the bug class this test pins
    import shutil

    src = str(tmp_path / "orig" / "t")
    t = SnapshotTable.create(spark, src)
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where("id = 1", mode="merge-on-read")
    t.delete_by_keys(spark.createDataFrame([(99,)], "id long"))
    dst = str(tmp_path / "moved" / "t")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.move(src, dst)
    moved = SnapshotTable.load(spark, dst)
    assert sorted(r.id for r in moved.scan().collect()) == [2]


def test_mor_merge_single_commit_upsert(spark, warehouse):
    # merge-on-read MERGE: ONE commit = equality delete on source keys
    # + appended source rows; no target file read or rewritten
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mmerge"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    before = _live_data_files(t)
    src = spark.createDataFrame(
        [(2, "B"), (9, "new")], "id long, data string"
    )
    sid = t.merge_upsert(src, keys=["id"], mode="merge-on-read")
    after = _live_data_files(t)
    assert set(before) <= set(after)  # nothing rewritten
    rows = {r.id: r.data for r in t.scan().collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 9: "new"}
    snap = t.snapshots().filter(f"snapshot_id = {sid}").collect()[0]
    assert snap.operation == "merge"
    assert snap.summary["merge-mode"] == "merge-on-read"
    # exactly one commit happened for the whole merge
    assert t.snapshots().count() == 2


def test_mor_merge_via_property_default(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mprop"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.set_properties({"write.merge.mode": "merge-on-read"})
    t.merge_upsert(
        spark.createDataFrame([(1, "A")], "id long, data string"), keys=["id"]
    )
    assert len(_live_deletes(t)) == 1
    assert {(r.id, r.data) for r in t.scan().collect()} == {(1, "A")}


def test_sql_tblproperties_and_call_procedures(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = SnapshotTable.create(spark, os.path.join(warehouse, "sqlp"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]), committed_at=1000)
    execute_sql(
        spark,
        warehouse,
        "ALTER TABLE sqlp SET TBLPROPERTIES "
        "('write.delete.mode'='merge-on-read')",
    )
    assert t.properties()["write.delete.mode"] == "merge-on-read"
    # SQL DELETE now takes the merge-on-read path via the property
    execute_sql(spark, warehouse, "DELETE FROM sqlp WHERE id = 1")
    assert len(_live_deletes(t)) == 1
    assert sorted(r.id for r in t.scan().collect()) == [2]
    # maintenance procedures (Iceberg CALL surface)
    r = execute_sql(
        spark, warehouse, "CALL system.rewrite_position_deletes('sqlp')"
    ).collect()[0]
    assert r.procedure == "rewrite_position_deletes"
    r = execute_sql(
        spark, warehouse, "CALL system.rewrite_data_files('sqlp')"
    ).collect()[0]
    assert r.procedure == "rewrite_data_files"
    assert _live_deletes(t) == []  # compaction folded the delete in
    execute_sql(spark, warehouse, "CALL system.create_tag('sqlp', 'v1')")
    assert "v1" in t.refs()
    execute_sql(
        spark, warehouse,
        "ALTER TABLE sqlp UNSET TBLPROPERTIES ('write.delete.mode')",
    )
    assert "write.delete.mode" not in t.properties()
    with pytest.raises(ValueError, match="unknown procedure"):
        execute_sql(spark, warehouse, "CALL system.nuke('sqlp')")


def test_mor_model_based_random_ops(spark, warehouse):
    """Model-based check of the MOR state machine: a seeded random
    sequence of append / MOR-delete / equality-delete / MOR-update /
    COW-delete / compact / rewrite ops runs against both the table and
    a plain python dict model; the scan must equal the model after
    every step. Exercises sequence-number scoping, carry composition,
    and delete materialization in combinations no single scenario test
    covers."""
    import random

    rng = random.Random(20260814)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "model"), schema="id long, data string"
    )
    model: dict[int, str] = {}
    next_id = 0

    def check():
        got = {(r.id, r.data) for r in t.scan(virtual_column=None).collect()}
        assert got == set(model.items()), (sorted(got), sorted(model.items()))

    for step in range(18):
        op = rng.choice(
            ["append", "mor_del", "eq_del", "mor_upd", "cow_del",
             "append", "mor_del", "eq_del", "compact", "rewrite"]
        )
        if op == "append" or not model:
            rows = []
            for _ in range(rng.randint(1, 4)):
                # ~1/3 re-use an existing id (post-delete re-insert path)
                if model and rng.random() < 0.33:
                    rid = rng.choice(sorted(model))
                else:
                    rid = next_id
                    next_id += 1
                rows.append((rid, f"v{step}_{rid}"))
            # a model dict keeps ONE row per id; make the batch match
            dedup = {}
            for rid, v in rows:
                dedup[rid] = v
            # appending an id that already exists would create a
            # duplicate row; equality-delete it first, like an upsert
            existing = [rid for rid in dedup if rid in model]
            if existing:
                t.delete_by_keys(
                    spark.createDataFrame([(i,) for i in existing], "id long")
                )
                for rid in existing:
                    del model[rid]
            t.append(
                spark.createDataFrame(
                    sorted(dedup.items()), "id long, data string"
                ).coalesce(1)
            )
            model.update(dedup)
        elif op == "mor_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}", mode="merge-on-read")
            del model[victim]
        elif op == "eq_del":
            victims = rng.sample(sorted(model), k=min(2, len(model)))
            t.delete_by_keys(
                spark.createDataFrame([(v,) for v in victims], "id long")
            )
            for v in victims:
                del model[v]
        elif op == "mor_upd":
            victim = rng.choice(sorted(model))
            t.update_where(
                f"id = {victim}", {"data": f"'u{step}'"}, mode="merge-on-read"
            )
            model[victim] = f"u{step}"
        elif op == "cow_del":
            victim = rng.choice(sorted(model))
            t.delete_where(f"id = {victim}")
            del model[victim]
        elif op == "compact":
            t.compact()
        elif op == "rewrite":
            t.rewrite_position_deletes()
        check()


# -- position_deletes metadata table -----------------------------------------


def test_position_deletes_table_lists_tombstones(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "pdt"))
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    s_del = t.delete_where("id = 2")
    pd_rows = t.position_deletes().collect()
    assert len(pd_rows) == 1
    [row] = pd_rows
    assert row.delete_snapshot_id == s_del
    assert row.file_path in _live_data_files(t)
    assert row.pos == 1  # second row of the single data file
    # empty before any delete (time travel to the append snapshot)
    assert t.position_deletes(snapshot_id=s_del - 1).count() == 0


def test_position_deletes_suffix_resolution(spark, warehouse):
    from hiveberg_spark.sources.snapshot_table import resolve_table

    t = SnapshotTable.create(spark, os.path.join(warehouse, "pds"))
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where("id = 1")
    df = resolve_table(spark, warehouse, "pds__position_deletes")
    assert df.count() == 1
    assert set(df.columns) == {
        "file_path", "pos", "delete_file_path", "delete_snapshot_id"
    }


def test_position_deletes_after_rewrite_consolidation(spark, warehouse):
    # rewrite_position_deletes folds N delete files into one; the table
    # must show the SAME tombstones under the new delete file
    t = SnapshotTable.create(spark, os.path.join(warehouse, "pdr"))
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(_simple_df(spark, [(i, f"d{i}") for i in range(6)]))
    t.delete_where("id = 1")
    t.delete_where("id = 3")
    before = {(r.file_path, r.pos) for r in t.position_deletes().collect()}
    assert len(before) == 2
    t.rewrite_position_deletes()
    after_df = t.position_deletes()
    after = {(r.file_path, r.pos) for r in after_df.collect()}
    assert after == before
    assert after_df.select("delete_file_path").distinct().count() == 1


def test_position_deletes_empty_without_mor(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "pde"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.delete_where("id = 1")  # copy-on-write: no delete files
    assert t.position_deletes().count() == 0
