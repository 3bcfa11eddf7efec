"""Semantic invariants for the round-10 operators — properties the
oracle hash can't state directly (shares summing to 1, decile balance,
monotone boundaries), pinned as unit tests."""

from __future__ import annotations

import math

from hiveberg_spark import registry

registry.load_all()


def test_upsampling_shares_and_budgets_consistent(spark, sf_dir):
    rows = registry.QUERIES["pipeline_quality_upsampling"](
        spark, sf_dir
    ).collect()
    assert {r.tier for r in rows} == {1, 2, 3}
    assert {r.tier: r.epochs for r in rows} == {1: 1, 2: 2, 3: 4}
    for r in rows:
        assert r.effective_tokens == r.epochs * r.raw_tokens
    assert abs(sum(r.effective_share for r in rows) - 1.0) < 1e-5
    # terciles: doc counts within 1 of each other by the value-crossing
    # rule is NOT guaranteed (ties share a side), but no tier is empty
    assert all(r.n_docs > 0 for r in rows)


def test_nucleus_topmass_boundary_is_exact(spark, sf_dir):
    rows = registry.QUERIES["sample_nucleus_topmass"](spark, sf_dir).collect()
    ordered = sorted(rows, key=lambda r: (-r.score_micro, r.doc_id))
    total = sum(r.score_micro for r in ordered)
    budget = math.floor(0.5 * total)
    cum, expect_kept = 0, set()
    for r in ordered:
        cum += r.score_micro
        if cum <= budget:
            expect_kept.add(r.doc_id)
    got_kept = {r.doc_id for r in rows if r.kept}
    assert got_kept == expect_kept
    # kept is a PREFIX of the quality order: once cum passes the budget
    # nothing later is kept
    seen_drop = False
    for r in ordered:
        if r.doc_id not in got_kept:
            seen_drop = True
        else:
            assert not seen_drop, "kept doc after the cutoff"


def test_uplift_deciles_cover_all_users_evenly(spark, sf_dir):
    rows = registry.QUERIES["events_uplift_deciles"](spark, sf_dir).collect()
    deciles = sorted(r.decile for r in rows)
    assert deciles == list(range(1, 11))
    sizes = {r.decile: r.n_a + r.n_b for r in rows}
    # ceil(rn*10/n) deciles differ in size by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_oov_rate_bounds_and_vocab_effect(spark, sf_dir):
    rows = registry.QUERIES["text_oov_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.oov_tokens <= r.n_tokens


def test_topk_coverage_monotone_in_k(spark, sf_dir):
    rows = {
        r.k: r
        for r in registry.QUERIES["text_topk_coverage"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {10, 100, 1000}
    assert (
        rows[10].coverage <= rows[100].coverage <= rows[1000].coverage
    )
    assert rows[1000].covered_tokens <= rows[1000].total_tokens


def test_kl_drift_nonnegative(spark, sf_dir):
    # KL divergence is >= 0 up to the nano-nat quantization error
    rows = registry.QUERIES["text_source_kl_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kl_nats >= -1e-6, r


def test_cluster_best_quality_keeps_exactly_one_per_cluster(spark, sf_dir):
    rows = registry.QUERIES["dedup_cluster_best_quality"](
        spark, sf_dir
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_rep, []).append(r)
    for rep, members in by_cluster.items():
        assert sum(1 for m in members if m.is_kept) == 1, rep


def test_asof_nearest_gap_is_minimal_and_tie_prefers_earlier(spark, sf_dir):
    rows = registry.QUERIES["asof_join_nearest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.nearest_event_us is not None:
            assert r.gap_us is not None and r.gap_us >= 0


def test_ewma_tracks_counts_within_range(spark, sf_dir):
    rows = registry.QUERIES["events_ewma_daily"](spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        lo, hi = min(r.n for r in rs), max(r.n for r in rs)
        for r in rs:
            # a convex-weight average can never leave the observed range
            assert lo - 1e-6 <= r.ewma <= hi + 1e-6, (t, r)
