"""General MERGE INTO (full Spark/Iceberg clause surface): conditional
matched UPDATE/DELETE, conditional NOT MATCHED INSERT with explicit
columns, first-match-wins ordering, the cardinality-violation guard,
and v3 lineage preservation through the copy-on-write execution."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _target(spark, warehouse, name):
    t = SnapshotTable.create(spark, os.path.join(warehouse, name))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "id long, v string, n long",
        ).coalesce(1)
    )
    return t


def test_clause_semantics_first_match_wins(spark, warehouse):
    t = _target(spark, warehouse, "cl")
    src = spark.createDataFrame(
        [(2, "B", -1), (3, "C", 5), (9, "new", 99), (8, "small", 3)],
        "id long, v string, n long",
    )
    sid = t.merge_into(
        src,
        keys=["id"],
        matched=[
            ("delete", "s.n < 0"),
            ("update", None, {"v": "concat(t.v, '+', s.v)", "n": "t.n + s.n"}),
        ],
        not_matched=[
            ("s.n > 50", None),  # INSERT *
            (None, {"id": "s.id", "v": "'capped'", "n": "cast(0 as long)"}),
        ],
    )
    rows = sorted(tuple(r) for r in t.scan(virtual_column=None).collect())
    assert rows == sorted(
        [
            (1, "a", 10),       # untouched
            (3, "c+C", 35),     # second matched clause (first's cond false)
            (4, "d", 40),       # untouched
            (8, "capped", 0),   # second not-matched clause
            (9, "new", 99),     # first not-matched clause, INSERT *
        ]
    )
    # v3 lineage: only genuinely modified rows take the merge's seq
    seqs = {
        r.id: r._last_updated_sequence_number
        for r in t.scan_with_row_lineage().collect()
    }
    assert seqs[1] == 1 and seqs[4] == 1
    assert seqs[3] == sid and seqs[9] == sid and seqs[8] == sid


def test_matched_only_and_not_matched_only(spark, warehouse):
    t = _target(spark, warehouse, "only")
    src = spark.createDataFrame(
        [(2, "x", 0), (9, "y", 1)], "id long, v string, n long"
    )
    # matched-only merge: unmatched source rows are dropped
    t.merge_into(src, keys=["id"], matched=[("delete", None)])
    assert sorted(r.id for r in t.scan(virtual_column=None).collect()) == [
        1, 3, 4,
    ]
    # not-matched-only merge: matched source rows are no-ops
    t.merge_into(src, keys=["id"], not_matched=[(None, None)])
    rows = {r.id: r.v for r in t.scan(virtual_column=None).collect()}
    assert rows == {1: "a", 3: "c", 4: "d", 2: "x", 9: "y"}


def test_cardinality_violation_fails_the_command(spark, warehouse):
    t = _target(spark, warehouse, "card")
    dup = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "id long, v string, n long"
    )
    with pytest.raises(Exception, match="cardinality"):
        t.merge_into(
            dup, keys=["id"], matched=[("update", None, {"n": "s.n"})]
        )
    # duplicate target keys are legal (each pairs with its own match)
    t.append(
        spark.createDataFrame([(1, "a2", 11)], "id long, v string, n long")
    )
    one = spark.createDataFrame([(1, "z", 7)], "id long, v string, n long")
    t.merge_into(one, keys=["id"], matched=[("update", None, {"n": "s.n"})])
    assert sorted(
        r.n for r in t.scan_where("id = 1").collect()
    ) == [7, 7]


def test_sql_merge_full_clause_surface(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = _target(spark, warehouse, "tgt")
    s = SnapshotTable.create(spark, os.path.join(warehouse, "src"))
    s.append(
        spark.createDataFrame(
            [(2, "B", -5), (3, "C", 7), (9, "N", 99)],
            "id long, v string, n long",
        ).coalesce(1)
    )
    execute_sql(
        spark,
        warehouse,
        """
        MERGE INTO tgt t USING src s ON t.id = s.id
        WHEN MATCHED AND s.n < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = concat(t.v, s.v), n = t.n + s.n
        WHEN NOT MATCHED AND s.n > 50
          THEN INSERT (id, v, n) VALUES (s.id, upper(s.v), s.n)
        """,
    )
    rows = sorted(tuple(r) for r in t.scan(virtual_column=None).collect())
    assert rows == sorted(
        [(1, "a", 10), (3, "cC", 37), (4, "d", 40), (9, "N", 99)]
    )
    # the classic upsert-all shape still routes through merge_upsert
    # (so write.merge.mode keeps applying)
    execute_sql(
        spark,
        warehouse,
        "MERGE INTO tgt USING src ON tgt.id = src.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    rows = {r.id: (r.v, r.n) for r in t.scan(virtual_column=None).collect()}
    assert rows[2] == ("B", -5) and rows[3] == ("C", 7)


def test_merge_into_prunes_by_source_bounds(spark, warehouse):
    t = SnapshotTable.create(spark, os.path.join(warehouse, "prune"))
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, "x", lo) for i in range(10)],
                "id long, v string, n long",
            ).coalesce(1)
        )
    before = set(t.plan_files())
    src = spark.createDataFrame([(105, "u", 0)], "id long, v string, n long")
    t.merge_into(
        src, keys=["id"], matched=[("update", None, {"v": "s.v"})]
    )
    after = set(t.plan_files())
    # only the 100-range file rewrote; the other two carried by path
    assert len(before & after) == 2
    assert t.scan_where("id = 105").collect()[0].v == "u"


def test_not_matched_by_source_clauses(spark, warehouse):
    # Spark 4 MERGE: target rows with NO source match take their own
    # clause chain (delete stale rows / flag surviving ones)
    t = _target(spark, warehouse, "nmbs")
    src = spark.createDataFrame(
        [(1, "A", 0), (9, "new", 9)], "id long, v string, n long"
    )
    t.merge_into(
        src,
        keys=["id"],
        matched=[("update", None, {"v": "s.v"})],
        not_matched=[(None, None)],
        not_matched_by_source=[
            ("delete", "t.n >= 40"),
            ("update", None, {"v": "concat(t.v, '_stale')"}),
        ],
    )
    rows = {r.id: (r.v, r.n) for r in t.scan(virtual_column=None).collect()}
    assert rows == {
        1: ("A", 10),          # matched update
        2: ("b_stale", 20),    # NMBS update
        3: ("c_stale", 30),    # NMBS update
        # 4 deleted by the first NMBS clause (n >= 40)
        9: ("new", 9),         # insert
    }


def test_sql_not_matched_by_source(spark, warehouse):
    from hiveberg_spark.sources.sql_timetravel import execute_sql

    t = _target(spark, warehouse, "tgt2")
    s = SnapshotTable.create(spark, os.path.join(warehouse, "src2"))
    s.append(
        spark.createDataFrame([(1, "A", 0)], "id long, v string, n long")
        .coalesce(1)
    )
    execute_sql(
        spark,
        warehouse,
        """
        MERGE INTO tgt2 t USING src2 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND t.n > 25 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = t.n + 1
        """,
    )
    rows = {r.id: (r.v, r.n) for r in t.scan(virtual_column=None).collect()}
    assert rows == {1: ("A", 10), 2: ("b", 21)}


def test_merge_into_random_churn_vs_model(spark, warehouse):
    """Randomized MERGE sequences against a pure-Python model: random
    clause sets (conditional matched update/delete, not-matched
    inserts, NMBS update/delete) over random sources — the executor's
    clause selection, bounds pruning, and union semantics must track
    the model exactly at every step."""
    import random

    rng = random.Random(0xA1B2)
    t = SnapshotTable.create(
        spark, os.path.join(warehouse, "mrgchurn"),
        schema="id long, v string, n long",
    )
    model: dict[int, tuple[str, int]] = {}
    rows = [(i, f"r{i}", i * 10) for i in range(8)]
    model.update({i: (v, n) for i, v, n in rows})
    t.append(spark.createDataFrame(rows, "id long, v string, n long").coalesce(1))

    for step in range(8):
        # source: unique keys, mix of hits and misses
        src_keys = rng.sample(range(0, 30), rng.randint(1, 5))
        src = [(k, f"s{step}_{k}", rng.randint(-5, 50)) for k in src_keys]
        src_df = spark.createDataFrame(src, "id long, v string, n long")
        threshold = rng.randint(-5, 50)
        use_nmbs = rng.random() < 0.4
        t.merge_into(
            src_df,
            keys=["id"],
            matched=[
                ("delete", f"s.n < {threshold}"),
                ("update", None, {"v": "s.v", "n": "t.n + s.n"}),
            ],
            not_matched=[(f"s.n >= {threshold}", None)],
            not_matched_by_source=(
                [("update", f"t.n > 100", {"n": "t.n - 1"})]
                if use_nmbs
                else None
            ),
        )
        # apply the same semantics to the model
        src_by_key = {k: (v, n) for k, v, n in src}
        new_model: dict[int, tuple[str, int]] = {}
        for k, (tv, tn) in model.items():
            if k in src_by_key:
                sv, sn = src_by_key[k]
                if sn < threshold:
                    continue  # matched delete
                new_model[k] = (sv, tn + sn)  # matched update
            else:
                if use_nmbs and tn > 100:
                    new_model[k] = (tv, tn - 1)
                else:
                    new_model[k] = (tv, tn)
        for k, (sv, sn) in src_by_key.items():
            if k not in model and sn >= threshold:
                new_model[k] = (sv, sn)  # insert *
        model = new_model
        got = {
            r.id: (r.v, r.n)
            for r in t.scan(virtual_column=None).collect()
        }
        assert got == model, f"diverged at step {step}"


def test_merge_into_on_branch_wap(spark, warehouse):
    # write-audit-publish: the clause merge lands on a branch; main is
    # untouched until fast_forward publishes it
    t = _target(spark, warehouse, "wap")
    t.create_branch("audit")
    src = spark.createDataFrame([(2, "B", 1)], "id long, v string, n long")
    t.merge_into(
        src, keys=["id"],
        matched=[("update", None, {"v": "s.v"})],
        branch="audit",
    )
    main_rows = {r.id: r.v for r in t.scan(virtual_column=None).collect()}
    assert main_rows[2] == "b"  # main unchanged
    branch_rows = {r.id: r.v for r in t.scan(ref="audit").collect()}
    assert branch_rows[2] == "B"
    t.fast_forward("audit")
    assert {r.id: r.v for r in t.scan(virtual_column=None).collect()}[2] == "B"


def test_merge_into_partitioned_table(spark, warehouse):
    t = SnapshotTable.create(
        spark,
        os.path.join(warehouse, "part"),
        partition_spec=[("bucket", "id", 4)],
    )
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}", i) for i in range(20)], "id long, v string, n long"
        )
    )
    src = spark.createDataFrame(
        [(3, "U", 0), (40, "I", 1)], "id long, v string, n long"
    )
    t.merge_into(
        src, keys=["id"],
        matched=[("update", None, {"v": "s.v"})],
        not_matched=[(None, None)],
    )
    rows = {r.id: r.v for r in t.scan(virtual_column=None).collect()}
    assert rows[3] == "U" and rows[40] == "I" and len(rows) == 21
    # bucket pruning still works on the post-merge layout
    assert len(t.plan_files("id = 3")) < len(t.plan_files())


def test_merge_into_with_added_default_column(spark, warehouse):
    t = _target(spark, warehouse, "dflt")
    t.add_column("tier", "int", default_sql="7")
    src = spark.createDataFrame(
        [(2, "B", 0, 9), (9, "N", 1, None)],
        "id long, v string, n long, tier int",
    )
    t.merge_into(
        src, keys=["id"],
        matched=[("update", None, {"tier": "s.tier"})],
        not_matched=[(None, None)],
    )
    rows = {r.id: r.tier for r in t.scan(virtual_column=None).collect()}
    # pre-add rows read the initial default; updated row takes source;
    # inserted row keeps its explicit NULL (no blanket coalesce)
    assert rows == {1: 7, 2: 9, 3: 7, 4: 7, 9: None}


def test_merge_into_after_field_id_reuse(spark, warehouse):
    # the clause merge must compose with id-resolved reads: rename a
    # column, reuse its name, then merge on the key — both generations
    # resolve correctly through the rewrite
    t = SnapshotTable.create(spark, os.path.join(warehouse, "fidmrg"))
    t.append(
        spark.createDataFrame(
            [(1, "old1"), (2, "old2")], "id long, a string"
        ).coalesce(1)
    )
    t.rename_column("a", "b")
    t.add_column("a", "string")
    src = spark.createDataFrame(
        [(2, "B2", "A2"), (9, "B9", "A9")], "id long, b string, a string"
    )
    t.merge_into(
        src, keys=["id"],
        matched=[("update", None, {"b": "s.b", "a": "s.a"})],
        not_matched=[(None, None)],
    )
    rows = {r.id: (r.b, r.a) for r in t.scan(virtual_column=None).collect()}
    assert rows == {
        1: ("old1", None),
        2: ("B2", "A2"),
        9: ("B9", "A9"),
    }


def test_cow_update_on_freshly_added_column(spark, warehouse):
    # the latent bug the reuse-merge test surfaced: a COW UPDATE
    # assignment to a just-added (default-less) column must apply to
    # rows in files that predate the add — not silently drop
    t = _target(spark, warehouse, "addupd")
    t.add_column("flag", "string")
    t.update_where("id = 2", {"flag": "'hit'"})
    rows = {r.id: r.flag for r in t.scan(virtual_column=None).collect()}
    assert rows == {1: None, 2: "hit", 3: None, 4: None}
