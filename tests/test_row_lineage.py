"""Iceberg v3 row lineage: commit-assigned first_row_id blocks give
every row a stable global `_row_id` (+ `_last_updated_sequence_number`)
without a natural key — the identity incremental consumers key on. The
reference's Iceberg 0.7 predates the feature; contract is the public
v3 spec (row-lineage section), with the block-map divergences
documented on scan_with_row_lineage."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _df(spark, rows):
    return (
        spark.createDataFrame(rows, "id long, data string")
        .coalesce(1)
        .sortWithinPartitions("id")
    )


def test_row_ids_dense_and_stable_across_appends(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "rl"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(5)]))
    first = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert first == {i: i for i in range(5)}
    t.append(_df(spark, [(i, f"b{i}") for i in range(5, 8)]))
    both = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert both == {i: i for i in range(8)}  # old block unchanged
    assert t._read_meta()["next_row_id"] == 8


def test_row_ids_survive_mor_delete_and_update(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mor"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(6)]))
    t.delete_where("id = 2", mode="merge-on-read")
    t.update_where("id = 4", {"data": "'upd'"}, mode="merge-on-read")
    rows = {r.id: (r._row_id, r.data) for r in t.scan_with_row_lineage().collect()}
    # untouched rows keep their ids; the MOR-updated row's new version
    # MATERIALIZES its old id into the new file (v3 preservation)
    for i in (0, 1, 3, 5):
        assert rows[i] == (i, f"a{i}")
    assert 2 not in rows
    assert rows[4] == (4, "upd")


def test_row_id_seq_reflects_adding_commit(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "seq"))
    s1 = t.append(_df(spark, [(1, "a")]))
    s2 = t.append(_df(spark, [(2, "b")]))
    rows = {
        r.id: r._last_updated_sequence_number
        for r in t.scan_with_row_lineage().collect()
    }
    assert rows == {1: s1, 2: s2}


def test_row_ids_time_travel(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "tt"))
    s1 = t.append(_df(spark, [(i, "x") for i in range(3)]))
    t.append(_df(spark, [(i, "y") for i in range(3, 5)]))
    old = {r.id: r._row_id for r in t.scan_with_row_lineage(snapshot_id=s1).collect()}
    assert old == {0: 0, 1: 1, 2: 2}


def test_cow_rewrite_preserves_ids(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cow"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))   # file A: 0-3
    t.append(_df(spark, [(i, f"b{i}") for i in range(4, 8)]))  # file B: 4-7
    t.delete_where("id = 6")  # COW rewrites file B only; file A carries
    rows = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    # carried file keeps its block; rewritten survivors keep their ids
    # via the materialized column (v3 preservation)
    assert rows == {i: i for i in (0, 1, 2, 3, 4, 5, 7)}


def test_compaction_preserves_ids(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cmp"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    t.append(_df(spark, [(i, f"b{i}") for i in range(4, 8)]))
    t.compact()
    rows = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert rows == {i: i for i in range(8)}
    # a second rewrite generation keeps them too (column round-trips)
    t.delete_where("id = 0")
    rows = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert rows == {i: i for i in range(1, 8)}


def test_cow_merge_preserves_matched_inserts_fresh(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mrg"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    t.merge_upsert(
        _df(spark, [(2, "upd"), (9, "new")]), keys=["id"]
    )
    rows = {r.id: (r._row_id, r.data) for r in t.scan_with_row_lineage().collect()}
    assert rows[2] == (2, "upd")  # matched row keeps its id
    for i in (0, 1, 3):
        assert rows[i] == (i, f"a{i}")
    assert rows[9][0] >= 4  # inserted row: fresh block id
    assert len({v[0] for v in rows.values()}) == len(rows)


def test_hidden_row_id_column_never_leaks(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "leak"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    t.delete_where("id = 1")  # rewrite materializes the column
    assert "__hb_row_id" not in t.scan().columns
    assert "__hb_row_id" not in t.scan_where("id = 2").columns
    ch = t.scan_changelog(1)
    assert "__hb_row_id" not in ch.columns
    # stats jobs skip engine-internal columns
    bounds = t.files().select("lower_bounds").collect()
    assert all(
        not any(k.startswith("__hb_") for k in r.lower_bounds)
        for r in bounds
    )


def test_row_ids_unique_after_random_churn(spark, warehouse):
    import random

    rng = random.Random(0x51D5)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "churn"), schema="id long, data string"
    )
    next_id = 0
    for step in range(8):
        op = rng.choice(["append", "append", "mor_del", "cow_del", "compact"])
        live = t.count_rows() if step else 0
        if op == "append" or live == 0:
            n = rng.randint(1, 3)
            t.append(_df(spark, [(i, f"v{step}") for i in range(next_id, next_id + n)]))
            next_id += n
        elif op == "mor_del":
            t.delete_where(f"id % 7 = {step % 7}", mode="merge-on-read")
        elif op == "cow_del":
            t.delete_where(f"id % 5 = {step % 5}")
        else:
            t.compact()
        got = [r._row_id for r in t.scan_with_row_lineage().collect()]
        assert all(v is not None for v in got)
        assert len(set(got)) == len(got), "row ids must stay unique"
        assert max(got, default=-1) < t._read_meta()["next_row_id"]


def test_empty_table_lineage_schema(spark, warehouse):
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "empty"), schema="id long, data string"
    )
    df = t.scan_with_row_lineage()
    assert df.count() == 0
    assert "_row_id" in df.columns
    assert "_last_updated_sequence_number" in df.columns


def test_changelog_keyed_on_row_lineage(spark, warehouse):
    # update detection with NO natural key: the pre/post images of a
    # COW UPDATE pair on _row_id because the rewrite preserved it
    t = SnapshotTable.create(spark, os.path.join(warehouse, "chrl"))
    s0 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    t.update_where("id = 2", {"data": "'upd'"})
    ch = t.scan_changelog(s0, compute_updates=True, use_row_lineage=True)
    rows = {(r._change_type, r.id): r for r in ch.collect()}
    assert ("update_preimage", 2) in rows and ("update_postimage", 2) in rows
    pre, post = rows[("update_preimage", 2)], rows[("update_postimage", 2)]
    assert pre._row_id == post._row_id == 2
    assert pre.data == "a2" and post.data == "upd"
    # untouched rows of the rewritten file paired off via their ids —
    # no phantom insert/delete rows for them
    assert not any(k[1] != 2 for k in rows)


def test_changelog_row_lineage_mor_update(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "chmor"))
    s0 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    t.update_where("id = 1", {"data": "'m'"}, mode="merge-on-read")
    ch = t.scan_changelog(s0, compute_updates=True, use_row_lineage=True)
    rows = {(r._change_type, r.id): r for r in ch.collect()}
    assert rows[("update_preimage", 1)]._row_id == 1
    assert rows[("update_postimage", 1)]._row_id == 1
    assert rows[("update_postimage", 1)].data == "m"
    assert len(rows) == 2


def test_changelog_row_lineage_insert_delete_stay_plain(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "chplain"))
    s0 = t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    t.delete_where("id = 1", mode="merge-on-read")
    ch = t.scan_changelog(s0, compute_updates=True, use_row_lineage=True)
    rows = {(r._change_type, r.id) for r in ch.collect()}
    assert rows == {("insert", 3), ("delete", 1)}


def test_changelog_row_lineage_rejects_both_key_sources(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "chbad"))
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="not both"):
        t.scan_changelog(
            1, compute_updates=True, use_row_lineage=True,
            identifier_columns=["id"],
        )


def test_row_lineage_suffix_and_changelog_call(spark, warehouse):
    from hiveberg_spark.sources.snapshot_table import resolve_table
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = SnapshotTable.create(spark, os.path.join(warehouse, "sqlrl"))
    s0 = t.append(_df(spark, [(i, f"a{i}") for i in range(3)]))
    t.update_where("id = 1", {"data": "'u'"})
    # __row_lineage suffix resolves to the lineage scan
    df = resolve_table(spark, warehouse, "sqlrl__row_lineage")
    assert {r.id: r._row_id for r in df.collect()} == {0: 0, 1: 1, 2: 2}
    # CALL system.create_changelog_view with row-lineage pairing
    ch = execute_sql(
        spark, warehouse,
        f"CALL system.create_changelog_view('sqlrl', {s0}, '', 'row_lineage')",
    )
    rows = {(r._change_type, r.id) for r in ch.collect()}
    assert rows == {("update_preimage", 1), ("update_postimage", 1)}
    # plain changelog form
    ch2 = execute_sql(
        spark, warehouse, f"CALL system.create_changelog_view('sqlrl', {s0})"
    )
    assert {(r._change_type, r.id) for r in ch2.collect()} == {
        ("insert", 1), ("delete", 1)
    }


def test_concurrent_handles_get_disjoint_blocks(spark, warehouse):
    # two independent handles (simulating two processes): the counter is
    # advanced under the commit lock, so blocks can never overlap even
    # through a stale handle
    loc = os.path.join(warehouse, "cblk")
    t1 = SnapshotTable.create(spark, loc)
    t2 = SnapshotTable(spark, loc)
    t1.append(_df(spark, [(i, "x") for i in range(3)]))
    t2.append(_df(spark, [(i, "y") for i in range(3, 5)]))  # stale handle
    rows = {r.id: r._row_id for r in t1.scan_with_row_lineage().collect()}
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    assert t1._read_meta()["next_row_id"] == 5


def test_row_ids_survive_expire_consolidation(spark, warehouse):
    # expire_snapshots consolidates surviving manifests; the carried
    # files' first_row_id blocks must re-record (a block never changes)
    t = SnapshotTable.create(spark, os.path.join(warehouse, "exp"))
    t.append(_df(spark, [(i, "x") for i in range(3)]), committed_at=1_000)
    t.append(_df(spark, [(i, "y") for i in range(3, 6)]), committed_at=2_000)
    t.append(_df(spark, [(i, "z") for i in range(6, 8)]), committed_at=9_000)
    t.expire_snapshots(5_000)  # expires the first two snapshots
    rows = {r.id: r._row_id for r in t.scan_with_row_lineage().collect()}
    assert rows == {i: i for i in range(8)}


def test_clone_carries_row_identity(spark, warehouse):
    from hiveberg_spark.sources.snapshot_table import SnapshotTable as ST

    t = SnapshotTable.create(spark, os.path.join(warehouse, "csrc"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    clone = ST.snapshot_of(
        spark, t.location, os.path.join(warehouse, "cdst")
    )
    rows = {r.id: r._row_id for r in clone.scan_with_row_lineage().collect()}
    assert rows == {i: i for i in range(4)}
    # the cloned counter prevents collisions on the clone's own appends
    clone.append(_df(spark, [(9, "n")]))
    rows = {r.id: r._row_id for r in clone.scan_with_row_lineage().collect()}
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3, 9: 4}
    assert len(set(rows.values())) == 5


def _seqs(t, **kw):
    return {
        r.id: r._last_updated_sequence_number
        for r in t.scan_with_row_lineage(**kw).collect()
    }


def test_cow_delete_preserves_last_updated_seq(spark, warehouse):
    # ADVICE r5: a COW rewrite copying unmodified rows must NOT bump
    # their _last_updated_sequence_number (v3 preservation, same
    # contract as _row_id) — else incremental consumers keyed on it
    # see phantom updates for every rewritten-but-untouched row
    t = SnapshotTable.create(spark, os.path.join(warehouse, "seqcow"))
    s1 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    s2 = t.append(_df(spark, [(i, f"b{i}") for i in range(4, 8)]))
    t.delete_where("id = 6")  # rewrites file B only
    seqs = _seqs(t)
    assert seqs == {0: s1, 1: s1, 2: s1, 3: s1, 4: s2, 5: s2, 7: s2}


def test_cow_update_bumps_only_modified_rows(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "sequpd"))
    s1 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    s2 = t.update_where("id = 2", {"data": "'upd'"})
    seqs = _seqs(t)
    assert seqs == {0: s1, 1: s1, 2: s2, 3: s1}


def test_compaction_preserves_last_updated_seq(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "seqcmp"))
    s1 = t.append(_df(spark, [(1, "a")]))
    s2 = t.update_where("id = 1", {"data": "'u'"})
    t.append(_df(spark, [(2, "b")]))
    s3 = t._read_meta()["current_snapshot_id"]
    t.compact()
    seqs = _seqs(t)
    assert seqs == {1: s2, 2: s3}
    # second-generation rewrite round-trips the materialized column
    t.delete_where("id = 2")
    assert _seqs(t) == {1: s2}


def test_cow_merge_seq_matched_bumps_unmatched_keeps(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "seqmrg"))
    s1 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    s2 = t.merge_upsert(_df(spark, [(2, "upd"), (9, "new")]), keys=["id"])
    seqs = _seqs(t)
    assert seqs == {0: s1, 1: s1, 2: s2, 3: s1, 9: s2}


def test_mor_update_new_version_takes_new_seq(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "seqmor"))
    s1 = t.append(_df(spark, [(i, f"a{i}") for i in range(4)]))
    s2 = t.update_where("id = 1", {"data": "'m'"}, mode="merge-on-read")
    seqs = _seqs(t)
    assert seqs == {0: s1, 1: s2, 2: s1, 3: s1}
    # and a later COW rewrite of that file preserves BOTH generations
    t.delete_where("id = 3")
    assert _seqs(t) == {0: s1, 1: s2, 2: s1}
