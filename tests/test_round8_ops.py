"""Unit invariants for the round-8 operators (beyond their oracle
parity rows): OPQ rotation properties, ordered streaming ticks, and the
exact-integer round-half-away division discipline."""

from __future__ import annotations

import os

import numpy as np
import pytest


def test_opq_rotation_is_orthogonal_and_deterministic():
    from hiveberg_spark.operators.quantization import PQ_M, _opq_rotation

    rng = np.random.RandomState(7)
    X = rng.standard_normal((256, 64))
    # anisotropy: stretch the first dimensions so allocation has work
    X[:, :8] *= 10.0
    R1 = _opq_rotation(X)
    R2 = _opq_rotation(X.copy())
    # deterministic (eigh sign pinning) and orthogonal
    assert np.array_equal(R1, R2)
    assert np.allclose(R1.T @ R1, np.eye(64), atol=1e-9)
    # variance-balanced: the max/min subspace log-variance loads after
    # rotation must be far closer than the unrotated split's
    def loads(Y):
        d = Y.shape[1] // PQ_M
        v = Y.var(axis=0)
        return [float(np.log(v[j * d : (j + 1) * d]).sum()) for j in range(PQ_M)]

    spread_rot = np.ptp(loads(X @ R1))
    spread_raw = np.ptp(loads(X))
    assert spread_rot < spread_raw / 2, (spread_rot, spread_raw)


def test_exact_integer_round_half_away_matches_float_rounding():
    # the (2a + b) // (2b) formula used by the PCA/whitening/Markov
    # pipelines must equal round-half-away-from-zero of a/b for
    # magnitudes where floats are exact, and stay exact beyond 2^63
    for a in [0, 1, 5, 7, 12345, 2**40 + 3]:
        for b in [1, 2, 3, 7, 1000]:
            got = (2 * a * 10 + b) // (2 * b)
            want = int(np.floor(a * 10 / b + 0.5))
            assert got == want, (a, b, got, want)
    # beyond float precision: 2^64 + 1 over 2 — floats cannot see the +1
    a, b = 2**64 + 1, 2
    assert (2 * a + b) // (2 * b) == 2**63 + 1  # round-half-up of a/b


def test_write_ticks_ordered_mtimes_strictly_increase(spark, tmp_path):
    from hiveberg_spark.operators.snapshot_stream import _write_ticks_ordered

    tick_dir = str(tmp_path / "ticks")
    os.makedirs(tick_dir)
    _write_ticks_ordered(spark, tick_dir, [11, 12, 13])
    per_tick = []
    for sid in (11, 12, 13):
        mts = []
        for root, _d, files in os.walk(os.path.join(tick_dir, f"tick_{sid}")):
            mts.extend(os.path.getmtime(os.path.join(root, f)) for f in files)
        assert mts, f"tick_{sid} wrote no files"
        per_tick.append(max(mts))
    assert per_tick[0] < per_tick[1] < per_tick[2], per_tick


def test_bbit_estimator_exact_for_identical_signatures():
    # P = 1 (all slots match) must map to resemblance exactly 1.0
    b = 2
    c = 1.0 / (1 << b)
    est = (1.0 - c) / (1.0 - c)
    assert est == 1.0


def test_cms_bound_is_positive_and_scales_with_corpus():
    from hiveberg_spark.operators.sketches import _CMS_D, _CMS_W

    assert _CMS_D >= 2 and _CMS_W >= 256
    # the contract's 4N/w bound at the fixture sizes exceeds the
    # expected overestimate (N/w) with a 4x margin by construction
    for n in (10_000, 100_000):
        assert 4.0 * n / _CMS_W > n / _CMS_W
