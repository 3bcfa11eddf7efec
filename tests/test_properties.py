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
