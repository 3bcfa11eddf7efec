"""Round-11 operator invariants: cross-run incremental dedup and the
documents -> embeddings backfill (VERDICT r10 #8), tested on PLANTED
corpora with known answers so the semantics are pinned independently of
the driver fixtures (which the oracle-parity suite covers)."""

from __future__ import annotations

import os

from hiveberg_spark import registry

registry.load_all()


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet")
    )


def test_incremental_dedup_fcfs_semantics_on_planted_corpus(spark, tmp_path):
    """Planted duplicates straddling the batch boundary (evens = batch 1,
    odds = the incremental batch):

      ids 0,2      unique batch-1 docs
      ids 4,1      EXACT duplicates across batches -> 1 is an FCFS dup
      ids 3,5      EXACT duplicates within the new batch -> 5 is a dup
                   (3 survives: smallest new id for a fresh hash)
      ids 6,7      NEAR duplicates (one word changed in a long doc) ->
                   one verified near pair with a new member
      id  9        unique new doc
    """
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
        (4, "same content across the batch boundary here"),
        (1, "same content across the batch boundary here"),
        (3, "duplicated inside the new batch of documents"),
        (5, "duplicated inside the new batch of documents"),
        (6, base),
        (7, base.replace("w39", "CHANGED")),
        (9, "a genuinely novel document with fresh words"),
    ]
    sf_dir = str(tmp_path / "planted_inc")
    _write_docs(spark, sf_dir, rows)
    r = registry.QUERIES["dedup_incremental_snapshot"](spark, sf_dir).collect()[0]
    assert r.n_initial_docs == 4  # ids 0,2,4,6
    assert r.n_new_docs == 5  # ids 1,3,5,7,9
    assert r.n_exact_dups_new == 2  # id 1 (seen in batch 1), id 5 (id 3 won)
    # (6,7) near pair + the two exact pairs (1,4),(3,5) — identical text
    # means identical shingles, so exact dups are jaccard-1.0 near pairs
    assert r.n_near_pairs_new == 3
    assert r.hash_state_matches and r.band_state_matches


def test_incremental_dedup_state_tables_reused_across_calls(spark, tmp_path):
    """build_once must make the second invocation serve from the stored
    state (same result, no duplicate appends)."""
    rows = [(0, "aa bb cc dd"), (1, "aa bb cc dd"), (2, "ee ff gg hh")]
    sf_dir = str(tmp_path / "planted_inc2")
    _write_docs(spark, sf_dir, rows)
    q = registry.QUERIES["dedup_incremental_snapshot"]
    first = q(spark, sf_dir).collect()[0]
    second = q(spark, sf_dir).collect()[0]
    assert first == second
    assert first.n_exact_dups_new == 1  # id 1 duplicates batch-1 id 0


def test_embedding_backfill_fills_exactly_the_withheld_tier(spark, tmp_path):
    sf_dir = str(tmp_path / "planted_bf")
    docs = [(i, f"document number {i} with some text body") for i in range(30)]
    _write_docs(spark, sf_dir, docs)
    embs = [
        (i, i % 3, [float(i), 1.0, 0.5, 0.25]) for i in range(30)
    ]
    spark.createDataFrame(
        embs, "vec_id long, label long, embedding array<float>"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    r = registry.QUERIES["pipeline_embedding_backfill"](spark, sf_dir).collect()[0]
    withheld = [i for i in range(30) if i % 7 == 0]  # 0,7,14,21,28
    assert r.n_docs == 30
    assert r.n_preexisting == 30 - len(withheld)
    assert r.n_missing == len(withheld)
    assert r.n_backfilled == len(withheld)
    assert r.backfilled_chars_sum == sum(
        len(t) for i, t in docs if i % 7 == 0
    )
    assert r.coverage_ok and r.norm_ok


def test_embedding_backfill_vectors_are_unit_normalized(spark, tmp_path):
    """The stored backfilled vectors themselves (not just the audit
    boolean) are unit-normalized and keyed by the withheld doc ids."""
    import math

    from hiveberg_spark.operators.timetravel import warehouse_dir
    from hiveberg_spark.sources.snapshot_table import SnapshotTable

    sf_dir = str(tmp_path / "planted_bf2")
    docs = [(i, f"text body {i} " + "x" * (i % 5)) for i in range(14)]
    _write_docs(spark, sf_dir, docs)
    spark.createDataFrame(
        [(i, 0, [1.0, 0.0]) for i in range(14)],
        "vec_id long, label long, embedding array<float>",
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    registry.QUERIES["pipeline_embedding_backfill"](spark, sf_dir).collect()
    store = SnapshotTable.load(
        spark, os.path.join(warehouse_dir(sf_dir), "emb_backfill_store")
    )
    rows = store.scan(virtual_column=None).filter("label = -1").collect()
    assert sorted(r.vec_id for r in rows) == [0, 7]
    for r in rows:
        assert abs(math.sqrt(sum(x * x for x in r.embedding)) - 1.0) < 1e-4
        assert len(r.embedding) == 8


def test_incremental_dedup_empty_new_batch(spark, tmp_path):
    """Even-only corpus: the incremental batch is EMPTY — every count
    legal, state equals the batch-1 build, no crash on empty appends."""
    rows = [(0, "aa bb cc dd ee"), (2, "ff gg hh ii jj"), (4, "aa bb cc dd ee")]
    sf_dir = str(tmp_path / "planted_empty")
    _write_docs(spark, sf_dir, rows)
    r = registry.QUERIES["dedup_incremental_snapshot"](spark, sf_dir).collect()[0]
    assert r.n_initial_docs == 3
    assert r.n_new_docs == 0
    assert r.n_exact_dups_new == 0
    assert r.n_near_pairs_new == 0
    assert r.hash_state_matches and r.band_state_matches


def test_incremental_dedup_all_identical_corpus(spark, tmp_path):
    """Degenerate hot-key corpus: every document identical. One hash
    key, every new doc an FCFS dup, near pairs = all (old,new)+(new,new)
    combinations (jaccard 1.0)."""
    rows = [(i, "the same exact document text repeated") for i in range(6)]
    sf_dir = str(tmp_path / "planted_same")
    _write_docs(spark, sf_dir, rows)
    r = registry.QUERIES["dedup_incremental_snapshot"](spark, sf_dir).collect()[0]
    assert r.n_initial_docs == 3 and r.n_new_docs == 3
    assert r.n_exact_dups_new == 3  # every odd doc is a dup
    # pairs with >=1 odd member out of C(6,2)=15 total: 15 - C(3,2)=3
    # even-even pairs = 12
    assert r.n_near_pairs_new == 12
    assert r.hash_state_matches and r.band_state_matches


def test_incremental_dedup_short_docs_exact_tier_only(spark, tmp_path):
    """Documents under the shingle width (<3 words) never enter the
    band index (no signature rows) but MUST still dedup exactly."""
    rows = [(0, "hi"), (1, "hi"), (2, "yo there"), (3, "yo there"), (5, "bye")]
    sf_dir = str(tmp_path / "planted_short")
    _write_docs(spark, sf_dir, rows)
    r = registry.QUERIES["dedup_incremental_snapshot"](spark, sf_dir).collect()[0]
    assert r.n_exact_dups_new == 2  # ids 1 and 3 duplicate batch-1 texts
    assert r.n_near_pairs_new == 0  # nothing shingles
    assert r.hash_state_matches and r.band_state_matches


def test_embedding_backfill_no_gap_is_a_noop_append(spark, tmp_path):
    """Corpus whose ids avoid the withheld tier entirely (no doc_id
    divisible by 7 and full embedding coverage): zero missing, zero
    backfilled, coverage still ok."""
    ids = [i for i in range(1, 20) if i % 7 != 0]
    sf_dir = str(tmp_path / "planted_nogap")
    _write_docs(spark, sf_dir, [(i, f"doc {i} text") for i in ids])
    spark.createDataFrame(
        [(i, 0, [1.0, 2.0]) for i in ids],
        "vec_id long, label long, embedding array<float>",
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    r = registry.QUERIES["pipeline_embedding_backfill"](spark, sf_dir).collect()[0]
    assert r.n_missing == 0 and r.n_backfilled == 0
    assert r.coverage_ok
    # norm audit over ZERO backfilled rows is vacuously TRUE (round-12
    # ADVICE fix: max-over-empty is NULL, coalesced to True to match
    # the oracle's unconditional TRUE on the degenerate case)
    assert r.norm_ok is True


def test_incremental_dedup_randomized_vs_python_bruteforce(spark, tmp_path):
    """Randomized differential: seeded corpora with heavy duplication
    and near-duplication; FCFS exact-dup counts and near-pair counts
    must equal an independent brute-force Python computation."""
    import random

    def brute(rows):
        evens = [(i, t) for i, t in rows if i % 2 == 0]
        odds = sorted((i, t) for i, t in rows if i % 2 == 1)
        seen = {t for _, t in evens}
        dups = 0
        for _, t in odds:
            if t in seen:
                dups += 1
            else:
                seen.add(t)
        sh = {}
        for i, t in rows:
            w = t.split(" ")
            sh[i] = (
                {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
                if len(w) >= 3
                else set()
            )
        near = 0
        ids = sorted(sh)
        for x, a in enumerate(ids):
            for b in ids[x + 1 :]:
                if a % 2 == 0 and b % 2 == 0:
                    continue
                sa, sb = sh[a], sh[b]
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                if union and round(inter / union, 6) >= 0.8:
                    near += 1
        return dups, near

    for seed in (11, 42):
        rng = random.Random(seed)
        vocab = [f"tok{k}" for k in range(30)]
        base_docs = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 25)))
            for _ in range(12)
        ]
        rows = []
        for i in range(40):
            t = rng.choice(base_docs)
            if rng.random() < 0.3 and len(t.split()) > 5:
                w = t.split(" ")
                w[rng.randrange(len(w))] = "MUT" + str(rng.randrange(3))
                t = " ".join(w)
            rows.append((i, t))
        sf_dir = str(tmp_path / f"rand_{seed}")
        _write_docs(spark, sf_dir, rows)
        r = registry.QUERIES["dedup_incremental_snapshot"](
            spark, sf_dir
        ).collect()[0]
        exp_dups, exp_near = brute(rows)
        assert r.n_exact_dups_new == exp_dups, f"seed {seed}: exact"
        assert r.n_near_pairs_new == exp_near, f"seed {seed}: near"
        assert r.hash_state_matches and r.band_state_matches
