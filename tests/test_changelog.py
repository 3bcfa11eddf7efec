"""Row-level CDC changelog (Iceberg create_changelog_view semantics):
net insert/delete rows per commit, computed from file-level diffs only
— carried files never read, carried-through rows pair off, a pure
compaction nets zero."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _simple_df(spark, rows):
    return spark.createDataFrame(rows, "id long, data string").coalesce(1)


def _changes(t, frm, to=None):
    return sorted(
        (r._commit_snapshot_id, r._change_type, r.id, r.data)
        for r in t.scan_changelog(frm, to).collect()
    )


def test_changelog_appends_are_inserts(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "app"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.append(_simple_df(spark, [(2, "b")]))
    assert _changes(t, 0) == [
        (1, "insert", 1, "a"),
        (2, "insert", 2, "b"),
    ]
    # half-open range: (from, to]
    assert _changes(t, 1) == [(2, "insert", 2, "b")]


def test_changelog_cow_delete_emits_only_net_deletes(spark, warehouse):
    # the COW rewrite carries most rows into a new file; they pair off
    # via exceptAll and only the actually-deleted row surfaces
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cow"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    sid = t.delete_where("id = 2")
    assert _changes(t, 1) == [(sid, "delete", 2, "b")]


def test_changelog_cow_update_is_delete_plus_insert(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "updc"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    sid = t.update_where("id = 1", {"data": "'A'"})
    assert _changes(t, 1) == [
        (sid, "delete", 1, "a"),
        (sid, "insert", 1, "A"),
    ]


def test_changelog_compaction_nets_zero(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "cmp"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.append(_simple_df(spark, [(2, "b")]))
    t.compact()
    assert _changes(t, 2) == []


def test_changelog_mor_delete_reads_only_targeted_files(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "mor"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    t.append(_simple_df(spark, [(10, "x")]))
    sid = t.delete_where("id = 2", mode="merge-on-read")
    assert _changes(t, 2) == [(sid, "delete", 2, "b")]


def test_changelog_mor_update_pairs(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "moru"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    sid = t.update_where("id = 2", {"data": "'B'"}, mode="merge-on-read")
    assert _changes(t, 1) == [
        (sid, "delete", 2, "b"),
        (sid, "insert", 2, "B"),
    ]


def test_changelog_equality_delete(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "eq"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b")]))
    sid = t.delete_by_keys(spark.createDataFrame([(1,)], "id long"))
    t.append(_simple_df(spark, [(1, "new")]))  # survives (newer seq)
    assert _changes(t, 1) == [
        (sid, "delete", 1, "a"),
        (sid + 1, "insert", 1, "new"),
    ]


def test_changelog_does_not_rereport_already_deleted_rows(spark, warehouse):
    # a COW rewrite after a MOR delete must not emit the MOR-deleted
    # row as a delete again (both sides read with their snapshot's
    # deletes applied)
    t = SnapshotTable.create(spark, os.path.join(warehouse, "nodup"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    s_mor = t.delete_where("id = 1", mode="merge-on-read")
    s_cow = t.delete_where("id = 2")
    assert _changes(t, 1) == [
        (s_mor, "delete", 1, "a"),
        (s_cow, "delete", 2, "b"),
    ]


def test_changelog_rollback_emits_inverse_changes(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "rb"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.append(_simple_df(spark, [(2, "b")]))
    sid = t.rollback_to(1)
    assert _changes(t, 2) == [(sid, "delete", 2, "b")]


def test_changelog_skips_unpublished_branch_commits(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "br"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.create_branch("audit")
    t.append(_simple_df(spark, [(9, "z")]), branch="audit")
    assert _changes(t, 0) == [(1, "insert", 1, "a")]
    t.fast_forward("audit")
    assert _changes(t, 0) == [
        (1, "insert", 1, "a"),
        (2, "insert", 9, "z"),
    ]


def test_changelog_empty_range_has_schema(spark, warehouse):
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "empty"), schema="id long, data string"
    )
    df = t.scan_changelog(0)
    assert df.count() == 0
    assert df.columns == [
        "id", "data", "_change_type", "_commit_snapshot_id", "_committed_at",
    ]


def test_changelog_compute_updates_pairs_on_identifier_columns(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "updpair"))
    t.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.update_where("id = 2", {"data": "'B'"})          # COW update
    t.delete_where("id = 3", mode="merge-on-read")     # plain delete
    t.append(_simple_df(spark, [(9, "z")]))            # plain insert
    rows = sorted(
        (r._commit_snapshot_id, r._change_type, r.id, r.data)
        for r in t.scan_changelog(
            1, compute_updates=True, identifier_columns=["id"]
        ).collect()
    )
    assert rows == [
        (2, "update_postimage", 2, "B"),
        (2, "update_preimage", 2, "b"),
        (3, "delete", 3, "c"),
        (4, "insert", 9, "z"),
    ]


def test_changelog_compute_updates_via_property(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "updprop"))
    t.append(_simple_df(spark, [(1, "a")]))
    t.set_properties({"identifier.columns": "id"})
    t.update_where("id = 1", {"data": "'A'"}, mode="merge-on-read")
    types = {
        r._change_type
        for r in t.scan_changelog(1, compute_updates=True).collect()
    }
    assert types == {"update_preimage", "update_postimage"}
    with pytest.raises(ValueError, match="identifier columns"):
        u = SnapshotTable.create(spark, os.path.join(warehouse, "noids"))
        u.append(_simple_df(spark, [(1, "a")]))
        u.scan_changelog(0, compute_updates=True)


def test_apply_changelog_mirrors_source_incl_key_reuse(spark, warehouse):
    """apply_changelog (the CDC consumer) replays a changelog range into
    a mirror table; a key deleted and re-inserted by the SAME source
    commit must survive in the mirror (delete-then-append with
    seq-scoped equality deletes)."""
    from hiveberg_spark.operators.snapshot_stream import apply_changelog

    src = SnapshotTable.create(spark, os.path.join(warehouse, "cl_src"))
    mirror = SnapshotTable.create(
        spark, os.path.join(warehouse, "cl_mir"), schema="id long, data string"
    )
    src.append(_simple_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # one commit that both removes key 2 and re-introduces it: overwrite
    # with a changed value (delete 2/b + insert 2/B in the same commit)
    src.overwrite(_simple_df(spark, [(1, "a"), (2, "B"), (4, "d")]))

    cursor = 0
    for sid in [s.snapshot_id for s in src.snapshots().collect()]:
        apply_changelog(src.scan_changelog(cursor, sid), mirror, ["id"])
        cursor = sid
    got = sorted(
        (r.id, r.data) for r in mirror.scan(virtual_column=None).collect()
    )
    assert got == [(1, "a"), (2, "B"), (4, "d")]
