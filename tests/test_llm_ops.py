"""Semantic tests for the LLM-pipeline operators: LSH recall against the
exact baseline, ANN quality vs brute force, simhash symmetry, multimodal
feature correctness vs a pure-python recomputation."""

from __future__ import annotations

import os

import pytest

from hiveberg_spark import registry
from hiveberg_spark.operators.simsearch import (
    dedup_embedding_allpairs,
    dedup_embedding_blocked,
)

registry.load_all()


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH candidate generation + exact verify must reproduce the exact
    inverted-index result (b=16, r=4 ⇒ P(miss | j≥0.8) < 3e-4; misses
    would be deterministic, so equality here is a stable property of the
    fixture, not flakiness)."""
    lsh = set(
        map(tuple, registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect())
    )
    exact = set(
        map(tuple, registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect())
    )
    assert lsh == exact
    assert len(exact) > 0, "fixture should contain near-duplicate pairs"


def test_lsh_ann_results_are_true_neighbors(spark, sf_dir):
    """ANN hits overlapping the brute-force top-5 must carry the exact
    cosine, and multi-table OR-amplified recall must clear a floor
    (deterministic planes → the measured 0.50-0.54 is stable; 0.3 floor
    leaves margin for fixture regeneration)."""
    from hiveberg_spark.operators.simsearch import lsh_topk

    brute = registry.QUERIES["simsearch_bruteforce_topk"](spark, sf_dir).collect()
    ann = lsh_topk(spark, sf_dir).collect()
    exact_scores = {(r.qid, r.vec_id): r.cosine for r in brute}
    hits = 0
    for r in ann:
        if (r.qid, r.vec_id) in exact_scores:
            hits += 1
            assert abs(exact_scores[(r.qid, r.vec_id)] - r.cosine) < 1e-9
    assert hits >= 0.3 * len(brute), (hits, len(brute))


def test_simhash_pairs_symmetric_and_bounded(spark, sf_dir):
    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.dedup import shingled, simhash_pairs

    rows = simhash_pairs(
        shingled(load_table(spark, sf_dir, "documents"))
    ).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 7  # round-7 tuned radius


def test_simhash_contract_row_planted_recall(spark, sf_dir):
    row = registry.QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_planted_pairs == 20
    assert r.n_found == 20
    assert bool(r.found_all) is True
    assert r.n_edit_pairs == 20
    assert bool(r.edit_recall_ok) is True


def test_multimodal_features_match_pure_python(spark, sf_dir):
    import numpy as np

    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.multimodal import fake_decode_meta, feature_frame

    out = {r.doc_id: r for r in feature_frame(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 200")
        .select("doc_id", "text")
        .collect()
    )
    assert len(out) == len(docs)
    for d in docs[:25]:
        payload = d.text.encode("utf-8")
        buf = np.frombuffer(payload, dtype=np.uint8)
        expect_hist = np.bincount(buf % 16, minlength=16).tolist()
        w, h, codec = fake_decode_meta(payload)
        got = out[d.doc_id]
        assert got.n_bytes == len(payload)
        assert (got.width, got.height, got.codec) == (w, h, codec)
        assert list(got.byte_hist) == expect_hist


def test_decode_media_compressed_tier_is_explicit_stub():
    # compressed codecs (PNG/JPEG/MP3) are genuinely absent here; the
    # uncompressed tier (WAV/PPM) decodes for real — see the tests below
    from hiveberg_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG")


def test_wav_roundtrip_decodes_real_pcm():
    import numpy as np

    from hiveberg_spark.operators.multimodal import decode_media, encode_wav

    rng = np.random.default_rng(7)
    samples = rng.integers(-30000, 30000, size=800, dtype=np.int16)
    d = decode_media(encode_wav(samples, rate=16000))
    assert (d["kind"], d["sample_rate"], d["channels"], d["bits"]) == (
        "audio", 16000, 1, 16,
    )
    assert d["n_frames"] == 800
    assert d["duration_s"] == 800 / 16000
    f = samples.astype(np.float64)
    assert abs(d["rms"] - float(np.sqrt(np.mean(f**2)))) < 1e-9
    assert d["peak"] == float(np.max(np.abs(f)))
    # stereo: frames = samples / channels
    st = decode_media(encode_wav(samples, rate=8000, channels=2))
    assert (st["channels"], st["n_frames"]) == (2, 400)


def test_ppm_decode_resize_real_pixels():
    import numpy as np

    from hiveberg_spark.operators.multimodal import decode_media, resize_media

    # 4x2 gradient image, with a header comment (netpbm allows them)
    pix = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    ppm = b"P6\n# test\n4 2\n255\n" + pix.tobytes()
    d = decode_media(ppm)
    assert (d["width"], d["height"], d["channels"]) == (4, 2, 3)
    assert np.array_equal(d["pixels"], pix)
    assert d["mean"] == float(pix.mean())
    # nearest-neighbor resize 4x2 -> 2x1: picks columns 0,2 of row 0
    r = decode_media(resize_media(ppm, 2, 1))
    expect = pix[[0]][:, [0, 2]]
    assert np.array_equal(r["pixels"], expect)
    with pytest.raises(NotImplementedError):
        resize_media(b"\x89PNG", 2, 2)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    # the query emits its own tolerance contract now (sketches.py);
    # every group must satisfy it
    rows = registry.QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows)


def test_grouped_agg_udf_close_to_sql(spark, sf_dir):
    """Pairwise float sums differ from SQL order, but only in low bits —
    the query itself now emits the tolerance contract; every group must
    satisfy it."""
    rows = registry.QUERIES["udf_pandas_grouped_agg"](spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows)


def test_embedding_blocked_subset_of_exact(spark, sf_dir):
    """Cell-blocked near-dup pairs must be a subset of the exact
    all-pairs result with identical scores — and with 2-probe
    assignment, FULL recall of the fixture's true pairs (VERDICT r2 #3:
    the old single-probe path returned 0 rows at sf0.01 and this test
    passed vacuously). Since round 11 the REGISTERED entry is the
    blocked path (VERDICT r10 #2), so the exact side here is the
    de-registered all-pairs truth surface."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup_embedding_allpairs(spark, sf_dir).collect()
    }
    blocked = dedup_embedding_blocked(spark, sf_dir).collect()
    for r in blocked:
        assert exact.get((r.vec_a, r.vec_b)) == r.cosine
    assert len(blocked) == len(exact)  # full recall on the fixture


def test_embedding_blocked_recall_on_planted_boundary_pairs(spark, tmp_path):
    """Planted corpus: background vectors hug 3 axis centroids; one
    near-dup pair sits INSIDE a cell, another STRADDLES the cell-0/
    cell-1 boundary (different nearest centroids — exactly the pair
    single-probe blocking silently dropped). 2-probe must recover
    both: recall == 1 vs the exact baseline, which must itself be
    non-empty."""
    import random

    rng = random.Random(7)
    dim, rows = 8, []
    axes = {0: 0, 1: 1, 2: 2}
    vid = 0
    for label, axis in axes.items():
        for _ in range(20):
            v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
            v[axis] = 1.0
            rows.append((vid, label, [float(x) for x in v]))
            vid += 1
    # same-cell near-dup pair (both tight on axis 0)
    rows.append((1000, 0, [1.0, 0.01] + [0.0] * (dim - 2)))
    rows.append((1001, 0, [1.0, 0.012] + [0.0] * (dim - 2)))
    # boundary near-dup pair: one leans to axis 0, the other to axis 1,
    # so their PRIMARY cells differ but each's second probe is shared
    rows.append((2000, 0, [0.72, 0.69] + [0.0] * (dim - 2)))
    rows.append((2001, 1, [0.69, 0.72] + [0.0] * (dim - 2)))
    sf_dir = str(tmp_path / "planted")
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_allpairs(spark, sf_dir).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_blocked(spark, sf_dir).collect()
    }
    assert (1000, 1001) in exact and (2000, 2001) in exact
    assert blocked <= exact
    recall = len(blocked & exact) / len(exact)
    assert recall == 1.0, f"blocked recall {recall} (missed {exact - blocked})"


def test_ivf_hits_are_true_neighbors_with_decent_recall(spark, sf_dir):
    from hiveberg_spark.operators.simsearch import ivf_topk

    brute = registry.QUERIES["simsearch_bruteforce_topk"](spark, sf_dir).collect()
    ivf = ivf_topk(spark, sf_dir).collect()
    exact_scores = {(r.qid, r.vec_id): r.cosine for r in brute}
    hits = sum(1 for r in ivf if (r.qid, r.vec_id) in exact_scores)
    # scores of overlapping hits must agree exactly
    for r in ivf:
        if (r.qid, r.vec_id) in exact_scores:
            assert abs(exact_scores[(r.qid, r.vec_id)] - r.cosine) < 1e-9
    # 3-of-10 cells probed: expect a meaningful fraction of true top-5
    assert hits >= len(brute) * 0.3, (hits, len(brute))


def test_fake_resize_dims():
    from hiveberg_spark.operators.multimodal import fake_resize_dims, resize_media

    assert fake_resize_dims(1000, 500, 250) == (250, 125)
    assert fake_resize_dims(100, 100, 250) == (100, 100)  # never upscale
    assert fake_resize_dims(1, 10000, 100) == (1, 100)
    with pytest.raises(NotImplementedError):
        resize_media(b"x", 10, 10)


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Adversarial skew guard (VERDICT r1 #8): a stop-shingle shared by
    every document must not quadratically connect the corpus, and pairs
    that are near-dups through RARE shingles must still surface with
    their exact (uncapped) Jaccard score."""
    from hiveberg_spark.operators.dedup import ngram_jaccard_pairs, shingled

    hot = "the quick fox"  # one 3-gram shared by all docs
    rows = []
    # two true near-dups: long shared rare tail + the hot shingle
    tail = " ".join(f"w{i}" for i in range(30))
    rows.append((0, f"{hot} {tail}"))
    rows.append((1, f"{hot} {tail} extra"))
    # 50 unrelated docs whose ONLY overlap is the hot shingle
    for i in range(2, 52):
        rows.append((i, f"{hot} " + " ".join(f"u{i}_{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingled(docs).persist()

    capped = ngram_jaccard_pairs(sh, 0.8, df_cap=10)
    uncapped = ngram_jaccard_pairs(sh, 0.8, df_cap=None)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    want = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped.collect()}
    # the true near-dup pair survives the cap with its exact score
    assert (0, 1) in got
    assert got == want  # capping changed nothing but the join size

    # docs overlapping ONLY in hot shingles produce no candidates at a
    # sub-threshold bound — the documented stop-shingle tradeoff
    only_hot = [(a, b) for (a, b) in got if a >= 2 and b >= 2]
    assert only_hot == []


def test_containment_hot_shingle_cap(spark):
    """Adversarial skew guard for the CONTAINMENT path (VERDICT r8 #2):
    same shape as the Jaccard guard — a stop-shingle shared by every
    document must not quadratically connect the corpus, and a true
    excerpt (subset) pair must still score its exact (uncapped)
    containment in both directions after the cap + full-set reverify."""
    from hiveberg_spark.operators.dedup import containment_pairs, shingled

    hot = "the quick fox"
    tail = " ".join(f"w{i}" for i in range(30))
    rows = [(0, f"{hot} {tail}")]  # the full doc
    # a prefix excerpt: its shingles are a strict subset of doc 0's
    rows.append((1, f"{hot} " + " ".join(f"w{i}" for i in range(10))))
    # 50 unrelated docs whose ONLY overlap is the hot shingle
    for i in range(2, 52):
        rows.append((i, f"{hot} " + " ".join(f"u{i}_{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingled(docs).persist()

    capped = containment_pairs(sh, 0.8, df_cap=10)
    uncapped = containment_pairs(sh, 0.8, df_cap=None)
    got = {(r.doc_a, r.doc_b): r.containment for r in capped.collect()}
    want = {(r.doc_a, r.doc_b): r.containment for r in uncapped.collect()}
    # the excerpt->source direction survives with its exact score 1.0
    assert got.get((1, 0)) == 1.0
    assert got == want  # capping changed candidates, never scores
    # the reverse (source->excerpt) direction is sub-threshold
    assert (0, 1) not in got
    # hot-only overlaps never become pairs
    assert [(a, b) for (a, b) in got if a >= 2 and b >= 2] == []


def test_temperature_mixture_upweights_low_resource(spark, sf_dir):
    """The defining property of temperature sampling (α<1): a source's
    kept/total rate must be weakly DECREASING in source size — smaller
    sources sample at a higher rate than larger ones — and the total
    kept count must stay within one-doc-per-source of the budget."""
    from pyspark.sql import functions as F

    out = registry.QUERIES["sample_temperature_mixture"](spark, sf_dir)
    per_src = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        )
        .collect()
    )
    rates = sorted(((r.n, r.kept / r.n) for r in per_src))
    for (n1, rate1), (n2, rate2) in zip(rates, rates[1:]):
        if n1 < n2:  # strictly smaller source ⇒ rate at least as high
            assert rate1 >= rate2 - 1e-9, (n1, rate1, n2, rate2)
    total = sum(r.n for r in per_src)
    kept = sum(r.kept for r in per_src)
    # each source's FLOOR drops < 1 doc ⇒ budget - n_sources ≤ kept ≤ budget
    assert total * 0.5 - len(per_src) <= kept <= total * 0.5


def test_decontamination_flags_exactly_the_overlapping_docs(spark, sf_dir):
    """Every doc flagged contaminated must actually share a 5-gram with
    the eval slice (no false positives), eval-source docs never appear,
    and the output covers every train doc exactly once."""
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.pipeline_ops import DECON_EVAL_SOURCE

    out = registry.QUERIES["decontaminate_ngram_overlap"](spark, sf_dir)
    rows = out.collect()
    assert all(r.source != DECON_EVAL_SOURCE for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    n_train = docs.filter(F.col("source") != DECON_EVAL_SOURCE).count()
    assert len(rows) == n_train
    assert len({r.doc_id for r in rows}) == n_train

    # recompute contamination for the flagged docs in plain python
    texts = {r.doc_id: r.text for r in docs.collect()}
    eval_ids = {
        r.doc_id for r in docs.filter(F.col("source") == DECON_EVAL_SOURCE).collect()
    }

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    eval_grams = set().union(*(grams(texts[i]) for i in eval_ids))
    for r in rows:
        assert (len(grams(texts[r.doc_id]) & eval_grams) > 0) == r.contaminated, r


def test_hll_merge_matches_monolithic_sketch(spark, sf_dir):
    """Sketch mergeability: unioning per-nation sketches must estimate
    the same as one monolithic region-level sketch (DataSketches HLL
    union with equal lgK is lossless), proving rollups never need to
    re-read data."""
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    merged = (
        j.groupBy("n_regionkey", "n_nationkey")
        .agg(F.expr("hll_sketch_agg(c_custkey, 14)").alias("s"))
        .groupBy("n_regionkey")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(s))").alias("est"))
    )
    mono = j.groupBy("n_regionkey").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 14))").alias("est")
    )
    m = {r.n_regionkey: r.est for r in merged.collect()}
    o = {r.n_regionkey: r.est for r in mono.collect()}
    assert m == o


def test_sq8_rerank_recall_vs_brute_force(spark, sf_dir):
    """Int8 scalar quantization on 64-dim vectors is near-lossless for
    ranking; with a 4×k rerank the top-k must match brute force almost
    everywhere (≥0.9 recall leaves margin for fixture regeneration),
    and every returned cosine is exact (rerank re-scores with floats)."""
    from hiveberg_spark.operators.quantization import sq8_topk

    sq = sq8_topk(spark, sf_dir)
    bf = registry.QUERIES["simsearch_bruteforce_topk"](spark, sf_dir)
    s = {(r.qid, r.vec_id): r.cosine for r in sq.collect()}
    b = {(r.qid, r.vec_id): r.cosine for r in bf.collect()}
    recall = len(s.keys() & b.keys()) / len(b)
    assert recall >= 0.9, recall
    for k in s.keys() & b.keys():  # exact rerank ⇒ identical scores
        assert s[k] == b[k], k


def test_pq_adc_recall_contract_and_determinism(spark, sf_dir):
    """PQ-ADC: the recall contract holds at the unit-test SF and the
    deterministic quantizer (fixed sample, first-k init) produces
    identical contract rows across runs."""
    from hiveberg_spark import registry

    a = registry.QUERIES["simsearch_pq_adc"](spark, sf_dir).collect()
    b = registry.QUERIES["simsearch_pq_adc"](spark, sf_dir).collect()
    assert a == b
    assert a[0].recall_ok is True
    assert a[0].n_truth == a[0].n_queries * 5


def test_quantized_cosine_tracks_float_cosine(spark, sf_dir):
    """The 1e-6 input quantization perturbs cosines by O(1e-6): the
    bit-exact quantized cosine must agree with the float-path cosine to
    well under the similarity scale the operators rank on."""
    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table
    from hiveberg_spark.operators.simsearch import (
        _dot,
        _norm,
        _qcos,
        _qdot,
        _qnorm2,
        _qvec,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    a = e.select(
        F.col("vec_id").alias("va_id"),
        F.col("embedding").alias("va"),
        _qvec(F.col("embedding")).alias("qa"),
    )
    b = e.select(
        F.col("vec_id").alias("vb_id"),
        F.col("embedding").alias("vb"),
        _qvec(F.col("embedding")).alias("qb"),
    )
    rows = (
        a.join(b, F.col("va_id") < F.col("vb_id"))
        .select(
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("fcos"),
            _qcos(
                _qdot(F.col("qa"), F.col("qb")),
                _qnorm2(F.col("qa")),
                _qnorm2(F.col("qb")),
            ).alias("qcos"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.fcos - r.qcos) < 5e-5, (r.fcos, r.qcos)


def test_kmeans_refine_partitions_corpus(spark, sf_dir):
    from hiveberg_spark import registry
    from hiveberg_spark.catalog import load_table

    out = registry.QUERIES["cluster_kmeans_refine"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in out) == n  # every vector in exactly one cell
    assert len(out) <= 10
    for r in out:
        # cohesion is a sum of per-member cosines, each <= 1
        assert r.cohesion <= r.n_members + 1e-9


def test_outlier_zscore_flag_and_moments(spark, sf_dir):
    from hiveberg_spark import registry

    rows = registry.QUERIES["embedding_outlier_zscore"](spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        assert bool(r.is_outlier) == (r.z < -2.0)
        by_label.setdefault(r.label, []).append(r.z)
    for zs in by_label.values():
        # z-scores are standardized per label: mean ~0, few outliers
        assert abs(sum(zs) / len(zs)) < 0.01
        assert sum(1 for z in zs if z < -2.0) <= 0.1 * len(zs)


def test_pca_power_spectral_properties(spark, sf_dir):
    """Top-eigenvector sanity: unit-norm loadings, eigenvalue at least
    the largest per-dimension variance (Rayleigh quotient of a PSD
    matrix dominates every diagonal entry), and deterministic across
    runs (fixed all-ones start)."""
    import math

    from pyspark.sql import functions as F

    from hiveberg_spark.catalog import load_table

    rows = registry.QUERIES["embedding_pca_power"](spark, sf_dir).collect()
    assert len(rows) == 64
    nrm = math.sqrt(sum(r.loading**2 for r in rows))
    assert abs(nrm - 1.0) < 1e-3, nrm
    lam = rows[0].eigenvalue
    assert all(r.eigenvalue == lam for r in rows)
    e = load_table(spark, sf_dir, "embeddings")
    var_max = (
        e.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.var_pop(F.col("v").cast("double")).alias("s2"))
        .agg(F.max("s2"))
        .head()[0]
    )
    assert lam >= var_max - 1e-6, (lam, var_max)
    again = registry.QUERIES["embedding_pca_power"](spark, sf_dir).collect()
    assert rows == again


def test_whiten_abtt_energy_accounting(spark, sf_dir):
    """All-but-the-top invariants: residual energy is what the top
    direction left behind (removed_frac in [0, 1)), corpus-mean
    removed_frac approximates the PCA eigenvalue share, and a vector
    aligned with the component loses more than an orthogonal one."""
    rows = registry.QUERIES["embedding_whiten_abtt"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.removed_frac < 1.0, r
        assert r.resid_norm >= 0.0
    fracs = sorted(r.removed_frac for r in rows)
    assert fracs[-1] > fracs[0]  # the top direction is not uniform


def test_ivf_persisted_matches_inmemory_ivf(spark, sf_dir):
    """The stored-index serve path must reproduce the in-memory IVF
    pipeline exactly: same quantizer, same lists, so same contract
    counts — and the stored lists must cover the corpus 1:1."""
    from hiveberg_spark.catalog import load_table

    row = registry.QUERIES["simsearch_ivf_persisted"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert bool(r.recall_ok) is True
    assert r.n_indexed == load_table(spark, sf_dir, "embeddings").count()
    assert r.n_truth == r.n_queries * 5


def test_waterfill_allocations_sum_to_budget(spark, sf_dir):
    """Water-filling's defining invariant: allocations sum to the budget
    (half the corpus tokens), uncapped sources keep their full count,
    and capped sources all sit at the common water level."""
    rows = registry.QUERIES["pipeline_budget_waterfill"](spark, sf_dir).collect()
    total = sum(r.tokens for r in rows)
    got = sum(r.allocation for r in rows)
    assert abs(got - total // 2) < 1e-6 * total
    levels = {r.allocation for r in rows if r.capped}
    assert len(levels) <= 1  # every capped source sits at one level
    for r in rows:
        if not r.capped:
            assert r.allocation == float(r.tokens)


def test_bot_detection_flags_only_planted_bots(spark, sf_dir):
    rows = registry.QUERIES["events_bot_detection"](spark, sf_dir).collect()
    bots = {r.user_id for r in rows if r.is_bot}
    assert bots == {9000, 9001, 9002}
    for r in rows:
        if r.user_id >= 9000:
            assert r.n_types == 1 and r.events_per_hour > 100
        else:
            assert r.events_per_hour < 1.0


def test_binary_hamming_identical_vector_distance_zero(spark):
    """The sign-pack must be a pure function of the vector: identical
    embeddings pack identically (hamming 0) and a sign-flipped embedding
    packs to the complement (hamming 64)."""
    from hiveberg_spark.operators.quantization import _sign_pack

    vec = [(-1.0) ** i * (0.1 + i / 100) for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec), (2, vec), (3, [-x for x in vec])],
        "vec_id long, embedding array<float>",
    )
    packed = {
        r.vec_id: (r.b0, r.b1)
        for r in df.select(
            "vec_id", _sign_pack(0).alias("b0"), _sign_pack(32).alias("b1")
        ).collect()
    }
    assert packed[1] == packed[2]
    mask32 = (1 << 32) - 1
    assert packed[3][0] == packed[1][0] ^ mask32
    assert packed[3][1] == packed[1][1] ^ mask32


def test_contamination_report_agrees_with_per_doc_flags(spark, sf_dir):
    """The per-source report must be exactly the rollup of the per-doc
    decontaminate flags — the report IS the pipeline, not a parallel
    implementation that can drift."""
    from pyspark.sql import functions as F

    flags = registry.QUERIES["decontaminate_ngram_overlap"](spark, sf_dir)
    want = {
        (r.source): (r.n, r.c)
        for r in flags.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("contaminated").cast("long")).alias("c"),
        )
        .collect()
    }
    got = {
        r.source: (r.n_docs, r.n_contaminated)
        for r in registry.QUERIES["pipeline_contamination_report"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_url_dedup_planted_variants_collapse(spark, sf_dir):
    rows = registry.QUERIES["dedup_url_host"](spark, sf_dir).collect()
    quads = [r for r in rows if r.n_copies == 4]
    # every doc_id < 25 contributes exactly one 4-variant canonical
    assert len(quads) == 25
    assert all(r.host == "example.com" for r in quads)
    # negatives stay unique
    assert all(r.n_copies in (1, 4) for r in rows)


def test_dedup_cascade_report_matches_stage_operators(spark, sf_dir):
    """Stage-1 numbers must equal dedup_exact_survivors' count; the
    total input must equal the corpus size."""
    from hiveberg_spark.catalog import load_table

    rows = {r.name: r for r in registry.QUERIES[
        "pipeline_dedup_cascade_report"](spark, sf_dir).collect()}
    n0 = load_table(spark, sf_dir, "documents").count()
    n1 = registry.QUERIES["dedup_exact_survivors"](spark, sf_dir).count()
    assert rows["exact"].docs_in == n0
    assert rows["exact"].docs_out == n1
    assert rows["neardup_jaccard"].docs_in == n1
    assert rows["neardup_jaccard"].docs_out == n1 - rows["neardup_jaccard"].docs_removed


def test_round9_audits_survive_empty_corpus(spark, tmp_path):
    """Robustness edge: the round-9 audit/report operators must not
    throw on an EMPTY documents table (schema present, zero rows) —
    the state every table is in before its first commit."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    spark.createDataFrame([], schema).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    for name in (
        "text_tokenizer_fertility",
        "text_ttr_hapax",
        "pipeline_pii_report",
        "pipeline_shard_manifest",
        "pipeline_budget_waterfill",
        "dedup_url_host",
        "dedup_cross_source_overlap",
    ):
        rows = registry.QUERIES[name](spark, str(tmp_path)).collect()
        assert rows == [], (name, rows)
    # one-row aggregates: a row of NULL metrics is acceptable, a crash
    # is not
    gini = registry.QUERIES["pipeline_token_gini"](spark, str(tmp_path)).collect()
    assert len(gini) == 1
    # the cascade report always emits its two stage rows; on an empty
    # corpus every count is 0 and the removal rates guard to 0.0
    # instead of raising ZeroDivisionError (ADVICE r9 #4)
    cascade = {
        r.name: r
        for r in registry.QUERIES["pipeline_dedup_cascade_report"](
            spark, str(tmp_path)
        ).collect()
    }
    assert cascade["exact"].docs_in == 0
    assert cascade["exact"].removal_rate == 0.0
    assert cascade["neardup_jaccard"].removal_rate == 0.0
