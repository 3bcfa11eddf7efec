"""Round-13 operator tests: hot-band DF cap + identical-hash collapse
in the media near-dup kernel (VERDICT r12 #3), deep-chain media
clustering (ADVICE r12), and bounded recall truth legs (VERDICT r12 #4).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def _signed(h: int) -> int:
    h &= (1 << 64) - 1
    return h - (1 << 64) if h >= 1 << 63 else h


def test_hot_band_cap_excludes_degenerate_buckets(spark):
    """VERDICT r12 #3 adversarial case: 1000 'flat images' whose hashes
    are identical in 3 of 4 bands (three 1000-deep buckets — quadratic
    candidate space without the cap) must NOT blow up candidate
    generation, while planted near-dup groups whose group-distinctive
    band bucket is far under the cap keep EVERY in-group pair
    (pigeonhole: radius 2 < 4 bands and the distinctive band is not
    hot)."""
    from hiveberg_spark.operators.multimodal import _banded_hamming_verified

    rows = []
    # noise: bands 0-2 all zero (hot), band 3 (bits 48-63) unique per row
    for i in range(1000):
        rows.append((10_000 + i, _signed(i << 48)))
    # two planted groups of 4: base hash with distinctive low bands,
    # members flip one low bit each (pairwise hamming <= 2)
    planted = {}
    for g, base in enumerate((0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321)):
        for m in range(4):
            h = base if m == 0 else base ^ (1 << (3 * m))
            planted[1000 * g + m] = h
            rows.append((1000 * g + m, _signed(h)))
    df = spark.createDataFrame(rows, "doc_id long, ahash long")

    stats: dict = {}
    got = _pairs(
        _banded_hamming_verified(df, 4, 2, df_cap=256, stats=stats)
    )
    # the three degenerate buckets were detected and dropped
    assert stats["n_hot_bands"] == 3, stats
    assert stats["n_distinct_hashes"] == 1008, stats
    # every planted in-group pair survives (distinctive band not hot)
    for g in (0, 1):
        ids = [1000 * g + m for m in range(4)]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = bin(planted[a] ^ planted[b]).count("1")
                assert ham <= 2
                assert (a, b) in got, (a, b)
    # the documented stop-band tradeoff: noise rows 1 and 3 are a TRUE
    # near-dup pair (hamming(1^3)=1) but every band they share is hot,
    # so the capped kernel misses them — this is the exactness bound
    # (missed only if ALL shared bands are hot), pinned here on purpose
    assert (10_001, 10_003) not in got
    # and nothing outside the radius ever passes verify
    for a, b in got:
        ha = planted.get(a, (a - 10_000) << 48 if a >= 10_000 else None)
        hb = planted.get(b, (b - 10_000) << 48 if b >= 10_000 else None)
        assert bin(ha ^ hb).count("1") <= 2


def test_hot_band_uncapped_still_exact(spark):
    """df_cap=None restores the exhaustive kernel: the noise pair the
    capped run misses is found when the cap is off."""
    from hiveberg_spark.operators.multimodal import _banded_hamming_verified

    rows = [(10_000 + i, _signed(i << 48)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, ahash long")
    got = _pairs(_banded_hamming_verified(df, 4, 2, df_cap=None))
    assert (10_001, 10_003) in got  # hamming(1^3) = 1


def test_identical_hash_collapse_tier(spark):
    """A production corpus's flat/black images hash byte-identically;
    they must collapse to ONE banding row (no quadratic bucket) while
    their true pairs — the same-hash clique plus the member-expanded
    cross-hash pairs — come back exactly."""
    from hiveberg_spark.operators.multimodal import _banded_hamming_verified

    H = 0x5555_0000_AAAA_FFFF
    rows = [(i, _signed(H)) for i in range(200)]  # 200 identical
    rows.append((900, _signed(H ^ 1)))  # hamming 1 from all of them
    rows.append((901, _signed(~H)))  # hamming 64 — never a pair
    df = spark.createDataFrame(rows, "doc_id long, ahash long")

    stats: dict = {}
    got = _pairs(_banded_hamming_verified(df, 4, 2, stats=stats))
    # only 3 DISTINCT hashes ever enter the banded join
    assert stats["n_distinct_hashes"] == 3, stats
    expect = {(a, b) for a in range(200) for b in range(a + 1, 200)}
    expect |= {(i, 900) for i in range(200)}
    assert got == expect
    assert len(got) == 200 * 199 // 2 + 200


def test_media_summary_survives_deep_chain(spark):
    """ADVICE r12: a duplicate CHAIN deeper than 10 hops used to blow
    min_label_components(max_rounds=10); the summary now clusters via
    star contraction (log-round bound), so a 40-link chain is one
    cluster kept by its min id."""
    from hiveberg_spark.operators.multimodal import _media_dedup_summary

    n = 41
    items = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    row = _media_dedup_summary(items, chain, "n_items").collect()[0]
    assert row.n_items == n
    assert row.n_dup_pairs == n - 1
    assert row.n_clusters == 1
    assert row.keeper_id_sum == 0
    assert row.n_removed == n - 1


def test_binaryfile_partition_pruning_in_plan(spark, tmp_path):
    """The binaryFile source must prune hive-layout partitions at plan
    time: the modality predicate lands in PartitionFilters (file
    listing skips the pruned prefix entirely), not as a post-scan
    Filter over already-read bytes."""
    from hiveberg_spark.plans.inspect import explain_str

    for mod in ("image", "audio", "corrupt"):
        d = tmp_path / f"modality={mod}"
        d.mkdir()
        (d / "00001.bin").write_bytes(b"x" * 8)
    df = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .filter(F.col("modality").isin("image", "audio"))
        .select("path", "length")
    )
    plan = explain_str(df, "formatted")
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "modality" in seg, seg
    # and the pruned listing really excludes the corrupt prefix
    paths = [r.path for r in df.collect()]
    assert len(paths) == 2
    assert not any("corrupt" in p for p in paths)


def test_prefix_filter_matches_inverted_index(spark):
    """Property: prefix filtering and the DF-capped inverted index are
    two candidate schemes for the SAME exact-Jaccard pair set — on any
    shingle-set corpus they must return identical pairs (both verify
    exactly, so only a candidate-generation miss could diverge)."""
    import random

    from hiveberg_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for doc in range(60):
        if doc % 3 == 0 and doc > 0:
            # near-copy of a previous doc: drop/add one shingle
            base = list(rows[doc - 1][1])
            if len(base) > 4:
                base.pop(rng.randrange(len(base)))
            rows.append((doc, sorted(set(base))))
        else:
            k = rng.randint(3, 12)
            rows.append((doc, sorted(set(rng.sample(vocab, k)))))
    sh = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    for t in (0.5, 0.8):
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in jaccard_prefix_filter_pairs(sh, t).collect()
        }
        want = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(sh, t).collect()
        }
        assert got == want, (t, got ^ want)
        assert want, f"vacuous at t={t}"  # fixture must produce pairs


def test_prefix_filter_theorem_bruteforce(spark):
    """Property (hypothesis): on ANY family of shingle sets and any
    threshold, the prefix-filtered pairs equal the brute-force exact-
    Jaccard pairs — the prefix-filter theorem (a >=t pair always shares
    a token in BOTH prefixes under one global order) may never lose a
    pair, and verify may never keep one below threshold."""
    from hypothesis import given, settings, strategies as st

    from hiveberg_spark.operators.dedup import jaccard_prefix_filter_pairs

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.sets(st.sampled_from([f"t{i}" for i in range(12)]),
                    min_size=1, max_size=8),
            min_size=2, max_size=10,
        ),
        st.sampled_from([0.3, 0.5, 0.8, 0.9]),
    )
    def _inner(sets, t):
        rows = [(i, sorted(s)) for i, s in enumerate(sets)]
        sh = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
        got = {
            (r.doc_a, r.doc_b)
            for r in jaccard_prefix_filter_pairs(sh, t).collect()
        }
        expect = set()
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                jac = round(inter / (len(sets[i] | sets[j])), 6)
                if jac >= t:
                    expect.add((i, j))
        assert got == expect, (t, sets, got ^ expect)

    _inner()


def test_prefix_filter_skew_immunity(spark):
    """The scale claim, measured: 1000 docs all share one HOT shingle
    (an inverted index would put 1000 postings in that bucket —
    ~500k candidate pairs); the prefix kernel indexes each doc's single
    RAREST shingle at t=0.8 (prefix_len = 4 - ceil(3.2) + 1 = 1), so
    the hot token never enters the index and candidates collapse to
    the planted duplicate pairs only."""
    from hiveberg_spark.operators.dedup import jaccard_prefix_filter_pairs

    rows = []
    for d in range(1000):
        # 4 shingles: the global HOT one + 3 unique-to-doc ones ...
        sh = ["HOT", f"a{d}", f"b{d}", f"c{d}"]
        if d % 100 == 1:
            # ... except every 100th doc duplicates its predecessor
            # exactly (jaccard 1.0 >= 0.8)
            sh = ["HOT", f"a{d-1}", f"b{d-1}", f"c{d-1}"]
        rows.append((d, sorted(set(sh))))
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    stats: dict = {}
    pairs = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_filter_pairs(df, 0.8, stats=stats).collect()
    }
    assert pairs == {(100 * k, 100 * k + 1) for k in range(10)}
    # one prefix posting per doc, and candidates = exactly the 10
    # duplicate pairs — the hot bucket contributed NOTHING
    assert stats["n_prefix_postings"] == 1000, stats
    assert stats["n_candidates"] == 10, stats


def test_blocked_cosine_exchange_stays_narrow(spark, sf_dir):
    """Perf plan contract (round-13 narrow-pair sweep): the blocked
    embedding dedup's pair-keyed Exchange must carry bare ids — the
    64-float arrays re-attach AFTER dropDuplicates. If the pipeline is
    reordered so the dedup shuffle carries embeddings again, this
    fails."""
    import re

    from hiveberg_spark.operators.simsearch import dedup_embedding_blocked
    from hiveberg_spark.plans.inspect import explain_str

    plan = explain_str(dedup_embedding_blocked(spark, sf_dir), "formatted")
    saw_pair_exchange = False
    for node in re.split(r"\n\(\d+\) ", plan):
        head = node.split("\n", 1)[0]
        if "Exchange" not in head:
            continue
        m = re.search(r"hashpartitioning\(([^)]*)\)", node)
        keys = m.group(1) if m else ""
        if "vec_a" in keys and "vec_b" in keys:
            saw_pair_exchange = True
            assert "embedding" not in node and " ea" not in node, node
    assert saw_pair_exchange, plan


def test_partitioned_ingest_poison_is_live():
    """The runtime-pruning proof in multimodal_partitioned_ingest rests
    on the pruned partitions holding payloads decode_media RAISES on —
    verify the poison is live (if these ever became decodable, the
    'files outside the predicate never decoded' guarantee would be
    vacuously green)."""
    import pytest

    from hiveberg_spark.operators.multimodal import decode_media

    for payload in (b"NOT-A-MEDIA-PAYLOAD-0",
                    b"media drop folder - do not decode"):
        with pytest.raises(NotImplementedError):
            decode_media(payload)


def test_driver_window_names_resolve():
    """Rotation guard: every DRIVER_WINDOW and DEFERRED_TO_NEXT_WINDOW
    name must be a registered query (a typo in a rotation edit would
    silently shrink the driver's 50-row gate), the window must hold
    exactly 50 unique names, the two lists must not overlap, and every
    window name must carry an oracle (the driver's hash gate)."""
    from hiveberg_spark import registry

    registry.load_all()
    w, d = registry.DRIVER_WINDOW, registry.DEFERRED_TO_NEXT_WINDOW
    assert len(w) == 50 and len(set(w)) == 50
    assert not set(w) & set(d)
    missing = [n for n in w + d if n not in registry.QUERIES]
    assert not missing, missing
    no_oracle = [n for n in w if n not in registry.ORACLES]
    assert not no_oracle, no_oracle
    ordered = list(registry.window_ordered(registry.QUERIES))
    assert ordered[:50] == w
