"""Deduplication operators [N] (SURVEY.md §2.11) over the documents table.

Four families, each a scale-designed Spark pipeline:
  - exact dedup: hash group-by (shuffle on content hash only)
  - n-gram Jaccard near-dup: shingle → inverted-index join → verify
    (the exact baseline; oracle-checked against DuckDB end-to-end)
  - MinHash+LSH near-dup: shingle → minhash signature → banded buckets →
    candidate join → exact verify (the 100 TB path: candidate generation
    touches only colliding bands, never the full pair space)
  - SimHash near-dup: 64-bit fingerprint → banded hamming buckets

Everything runs in JVM higher-order functions (transform/aggregate/
zip_with) — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hiveberg_spark.caching import persist_tracked
from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query

JACCARD_THRESHOLD = 0.8

# -- shared building blocks -------------------------------------------------


def shingled(docs: DataFrame, n: int = 3, repartition: bool = True) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word n-gram shingles.

    Guarded for docs shorter than n words (empty shingle set).

    repartition=False skips the parallelism shuffle — right when the
    input is already a SMALL candidate-bounded frame (the incremental
    serve paths semi-join to candidate-involved docs first; a 32-task
    shuffle of a few hundred rows costs more than it buys).

    The input is repartitioned first: the fixture is a single parquet
    file (= 1 partition), and shingling/minhashing is the CPU-heavy
    per-row stage — a cheap narrow-input shuffle unlocks full-core
    parallelism here and is exactly what a 100 TB run does between its
    IO-bound scan and CPU-bound fingerprint stages.

    `words` is materialized as a real column BEFORE the shingle lambda:
    an inlined split() expression is re-evaluated for every element_at
    reference inside the lambda (~3·n_words splits per document —
    measured ~10× slower)."""
    if repartition:
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
    with_words = docs.select("doc_id", F.split("text", " ").alias("words"))
    words = F.col("words")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    # concat built from the parameter (ADVICE fix: the lambda previously
    # hardcoded three element_at terms, silently wrong for n != 3)
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(1, n + 1)]
        ),
    )
    shingles = F.when(F.size(words) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )
    return with_words.select("doc_id", shingles.alias("shingles"))


def set_equality_match(
    a: DataFrame, b: DataFrame, cols: list, out_name: str
) -> DataFrame:
    """One-row boolean frame: TRUE iff `a` and `b` agree as key sets on
    `cols`.

    Round 15 (guide §2.4/§7.2): the audit legs used to union the two
    anti-join directions — and Catalyst duplicates each side's whole
    subtree under the union branches, so an expensive rebuild side (a
    corpus md5 pass, a shingle→minhash banding pipeline, a batch
    decontamination run) executed TWICE per audit. One full-outer join
    with per-side presence markers computes the identical boolean from
    a single evaluation of each side: a key set differs iff some joined
    row is missing either marker. (Duplicate keys matched by the other
    side carry both markers, exactly as they never appeared in either
    anti-join.)"""
    am = a.withColumn("_a", F.lit(True))
    bm = b.withColumn("_b", F.lit(True))
    mismatch = F.count(
        F.when(F.col("_a").isNull() | F.col("_b").isNull(), 1)
    )
    return am.join(bm, cols, "full_outer").agg(
        (mismatch == 0).alias(out_name)
    )


def _verified_pairs(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Join candidate (doc_a, doc_b) pairs back to shingle sets and keep
    pairs with exact Jaccard >= threshold."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# -- exact dedup --------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS content_hash
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash, keep-first policy. Scale: shuffles
    (hash, doc_id) pairs only; the md5 group key caps shuffle width at
    the distinct-content count."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


@query(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id FROM (
      SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_survivors(spark, sf_dir):
    """Window-keep-first formulation (returns surviving rows, not group
    stats) — the form a pipeline actually materializes."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


# -- exact n-gram Jaccard (oracle-checked baseline) ---------------------------


_NGRAM_JACCARD_ORACLE = f"""
    WITH docs AS (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS shingles
      FROM docs
    ),
    tok AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(i / (len(sa.shingles) + len(sb.shingles) - i), 6) AS jaccard
    FROM inter
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b
    WHERE i / (len(sa.shingles) + len(sb.shingles) - i) >= {JACCARD_THRESHOLD}
    """


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact near-dup pairs by 3-gram shingle Jaccard via inverted-index
    join. Candidate generation runs over a document-frequency-CAPPED
    index (hot stop-shingles with DF > cap are excluded — VERDICT r1 #8:
    the Σ freq(shingle)² blow-up on a skewed corpus is now bounded by
    cap·|hot shingles| instead of unbounded); the Jaccard itself is then
    verified EXACTLY from the full shingle sets, so capping only affects
    which pairs become candidates, never their score. A pair is missed
    only if ALL its shared shingles are hot — the standard stop-shingle
    tradeoff, asserted in tests."""
    return ngram_jaccard_pairs(
        persist_tracked(shingled(load_table(spark, sf_dir, "documents"))),
        JACCARD_THRESHOLD,
        SHINGLE_DF_CAP,
    )


SHINGLE_DF_CAP = 1000  # docs per shingle before it's treated as a stop-shingle


def ngram_jaccard_pairs(
    sh: DataFrame, threshold: float, df_cap: int | None = None
) -> DataFrame:
    """Exact Jaccard pairs from a shingled frame via inverted-index
    self-join, with hot shingles (document frequency > df_cap) excluded
    from the index.

    Exactness is preserved: let H = number of distinct hot shingles.
    A pair's true intersection i ≤ i_rare + H, so
    (i_rare + H) / (na + nb - i_rare - H) upper-bounds its Jaccard —
    pairs below threshold on the bound are pruned exactly. When H = 0
    (every realistic small-SF corpus) the bound IS the exact Jaccard and
    no verify pass runs; when H > 0 the surviving candidates (bounded by
    cap·|tokens|, not Σ freq²) are re-verified from the full shingle
    sets.

    Round 15 (guide §2.3/§2.4): each doc's set size rides along the
    exploded token rows (one int) and survives the candidate aggregation
    as min(na)/min(nb), so the two post-aggregation doc-keyed size joins
    are GONE — two fewer joins over the candidate frame (two fewer
    corpus-keyed exchanges once the size table stops broadcasting at
    scale) for 4 bytes per token row. Same ints, same Jaccard, same
    pairs."""
    tok_all = sh.select(
        "doc_id",
        F.size("shingles").alias("na"),
        F.explode("shingles").alias("s"),
    )
    n_hot = 0
    tok = tok_all
    if df_cap is not None:
        dfreq = tok_all.groupBy("s").agg(F.count("*").alias("df"))
        # persist: `hot` is consumed again by the anti-join below (on BOTH
        # sides of the self-join), which would otherwise re-plan the full
        # explode+groupBy once per consumer (guide §5 caching; the r12
        # double-plan rule). Tiny frame — hot shingles only.
        hot = persist_tracked(dfreq.filter(F.col("df") > df_cap))
        n_hot = hot.count()  # scalar plan constant (tiny agg job)
        if n_hot:
            tok = tok_all.join(hot.select("s"), "s", "left_anti")
    t2 = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("na").alias("nb"),
        F.col("s").alias("s2"),
    )
    inter = (
        tok.join(t2, (tok.s == t2.s2) & (tok.doc_id < t2.doc_b))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(
            F.count("*").alias("i"),
            F.min("na").alias("na"),  # constant per doc_a — min IS the value
            F.min("nb").alias("nb"),
        )
    )
    bound = (F.col("i") + n_hot) / (F.col("na") + F.col("nb") - F.col("i") - n_hot)
    cands = inter.filter(bound >= threshold)
    if n_hot == 0:
        jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
        return cands.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    return _verified_pairs(cands.select("doc_a", "doc_b"), sh, threshold)


# -- prefix filtering (second exact-Jaccard kernel, round 13) -----------------


@query("dedup_jaccard_prefix_filter", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_jaccard_prefix_filter(spark, sf_dir):
    """PREFIX-FILTERING near-dup pairs — the SSJoin/PPJoin candidate
    scheme (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08, both public)
    as a SECOND independent kernel certified against the SAME oracle
    as `dedup_ngram_jaccard` (the house second-algorithm discipline:
    two different candidate generators must converge on the identical
    exact-Jaccard pair set, so a regression in either blocking scheme
    flips one row red while the other stays green).

    Scheme: order each doc's shingles by ascending GLOBAL document
    frequency (rarest first; ties on the shingle string so the order
    is total and deterministic), index only the first
    |S| - ceil(t·|S|) + 1 of them, and generate candidates from
    prefix-token collisions alone — any pair with Jaccard >= t shares
    a prefix token (the prefix-filter theorem), then exact-verify.

    Scale: structurally complementary to the DF-capped inverted index —
    prefixes hold each doc's RAREST shingles, so hot stop-shingles
    almost never enter the index at all (no cap needed, no recall
    bound to reason about), and candidate space is Σ df(prefix-token)²
    over rare tokens. One extra shuffle vs the DF-cap path (the global
    DF join + per-doc rank window) buys that skew-immunity."""
    return jaccard_prefix_filter_pairs(
        persist_tracked(shingled(load_table(spark, sf_dir, "documents"))),
        JACCARD_THRESHOLD,
    )


def jaccard_prefix_filter_pairs(
    sh: DataFrame,
    threshold: float,
    stats: dict | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via prefix-filtered candidate generation.

    `stats` (tests) receives n_prefix_postings / n_candidates — the
    measurable form of the skew-immunity claim: a stop-shingle shared
    by every doc enters a doc's prefix only when it is among that
    doc's |S|-ceil(t|S|)+1 RAREST shingles, so hot tokens drive
    candidate volume only for near-empty docs.

    Round 14 (VERDICT r13 #6): the per-doc rarity rank is computed by
    attaching the global DF to each token (AQE picks a broadcast join
    when the aggregated DF table fits, which it does at bench SFs) and
    slicing the per-doc (df, s)-sorted array to the prefix length — one
    doc-keyed exchange total, where the previous formulation paid a
    token-keyed join exchange PLUS a doc-keyed row_number window. The
    (df asc, s asc) order is the identical total order, so the prefix
    set — and therefore the candidate set — is unchanged.

    No forced broadcast hint: the distinct-shingle DF table scales with
    the corpus, so a hint would bypass AQE's size check and OOM
    executors on a 100 TB run (the repo-wide no-forced-broadcast rule);
    AQE's runtime-size rewrite already broadcasts it wherever it fits."""
    tok = sh.select("doc_id", F.explode("shingles").alias("s"))
    dfreq = tok.groupBy("s").agg(F.count("*").alias("df"))
    n = F.size("arr")
    prefix_len = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    # persisted: BOTH sides of the candidate self-join consume this
    # frame — without the persist the whole DF-join + prefix-slice
    # pipeline plans (and runs) twice (the round-12 self-join lesson)
    prefix = persist_tracked(
        tok.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("arr"))
        .select("doc_id", F.explode(F.slice("arr", 1, prefix_len)).alias("e"))
        .select("doc_id", F.col("e.s").alias("s"))
    )
    cands = (
        prefix.select(F.col("doc_id").alias("doc_a"), "s")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if stats is not None:
        stats["n_prefix_postings"] = prefix.count()
        cands = persist_tracked(cands)
        stats["n_candidates"] = cands.count()
    return _verified_pairs(cands, sh, threshold)


# -- MinHash + LSH (the scale path) -------------------------------------------

_N_PERM = 64
_BANDS = 16
_ROWS = _N_PERM // _BANDS  # 4 → catches j>=0.8 w.p. ~1-(1-0.8^4)^16 ≈ 0.9998


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, s0..s63) — minhash signature per document, one column per
    permutation.

    Formulated as explode → 64 plain `min` aggregates (not nested array
    lambdas): partial aggregation runs map-side, the shuffle carries only
    64 longs per document, and whole-stage codegen stays small and flat.
    The permutation family is a 64-bit wraparound affine transform of one
    xxhash64 base hash (ANSI off, see session.py); constants derive from
    the permutation index, so signatures are deterministic across runs
    with zero stored state."""
    tok = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    def i64(x: int) -> int:  # wrap a Python int into signed 64-bit
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= (1 << 63) else x

    # Built via F.expr, not the Column API: the 64-term loop costs ~6
    # py4j round-trips per operator through the Column API (~0.5 s of
    # DRIVER time per construction, measured r14 — a serial tax on
    # every minhash pipeline), vs one parse call per permutation here.
    # Identical Catalyst expressions (ANSI off: bigint mul/add wrap the
    # same way), so signatures are bit-identical.
    perms = [
        F.expr(
            f"min(h * {2 * p + 1}L"
            f" + {i64((p + 1) * -7046029254386353131)}L) AS s{p}"
        )
        for p in range(_N_PERM)
    ]
    return tok.groupBy("doc_id").agg(*perms)


def _band_hash_expr(n_bands: int, n_rows: int):
    """array(xxhash64(s0..s{r-1}), ...) banding column over signature
    columns s0..s{b*r-1} — built as ONE parsed SQL expression instead
    of ~100 Column-API py4j round-trips (the r14 driver-construction
    fix; identical Catalyst expression either way)."""
    return F.expr(
        "array("
        + ", ".join(
            "xxhash64("
            + ", ".join(f"s{b * n_rows + r}" for r in range(n_rows))
            + ")"
            for b in range(n_bands)
        )
        + ")"
    )


@query("dedup_minhash_lsh", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-verified.

    Oracle: the SAME exact-Jaccard SQL as dedup_ngram_jaccard. Banding
    (b=16, r=4) misses a j≥0.8 pair with p<3e-4 and the hash family is
    deterministic, so LSH output == exact output is a stable property of
    the fixture, verified at sf0.001 AND sf0.01 before attaching the
    oracle (and continuously by test_minhash_lsh_matches_exact_jaccard).

    Pipeline: shingle → 64-perm minhash → 16 bands × 4 rows → explode
    bands → shuffle on (band, band_hash) → candidate pairs from bucket
    self-join → exact Jaccard verify → pairs ≥ 0.8.

    Scale: the pair space is never materialized — only same-bucket
    collisions; bucket skew is bounded because a band hash collision
    already implies high similarity. This is the 100 TB dedup path; the
    inverted-index exact variant is the small-scale oracle."""
    # persist: the shingle stage is the expensive per-row compute and is
    # consumed three times (signatures + both sides of the verify join);
    # at 100 TB this is a materialized signatures table
    sh = persist_tracked(shingled(load_table(spark, sf_dir, "documents")))
    sigs = minhash_signatures(sh)
    band_hashes = _band_hash_expr(_BANDS, _ROWS)
    # persist: the self-join consumes bands twice; without this the
    # whole shingle→signature pipeline executes once per side
    bands = persist_tracked(sigs.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    ))
    other = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band2"),
        F.col("band_hash").alias("band_hash2"),
    )
    cands = (
        bands.join(
            other,
            (bands.band == other.band2)
            & (bands.band_hash == other.band_hash2)
            & (bands.doc_id < other.doc_b),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return _verified_pairs(cands, sh, JACCARD_THRESHOLD).orderBy("doc_a", "doc_b")


# -- SimHash ------------------------------------------------------------------


def simhash_pairs(
    d: DataFrame, bands: int = 8, width: int = 8, radius: int = 7
) -> DataFrame:
    """SimHash near-dup pairs over a shingled frame: 64-bit fingerprint
    = sign-aggregated word-hash bits; near-dup candidates share one of
    `bands` `width`-bit bands (the ≤`radius` hamming guarantee needs
    every within-radius pair to collide on ≥1 band — bands > radius by
    pigeonhole); verified by exact hamming distance.

    Defaults re-tuned by the round-7 parameter study (VERDICT r6 #7,
    ARCHITECTURE.md roadmap) on the documents corpus with planted
    one-token edits: edited near-dups land at hamming mean 4 / p90 7 /
    p99 12 while random pairs never drop below 18 (p1 = 23), so the
    round-6 setting (4×16, radius 3) silently missed HALF the one-token
    edits (measured recall 0.46-0.49) with nothing gained — 8 bands ×
    8 bits, radius 7 lifts edited-pair recall to ~0.9 with zero
    false-accept risk (18 >> 7) at ~n²×8/2^8 candidate cost, which the
    exact-hamming verify then filters. On larger/more-similar corpora
    re-widen the bands (more bits per band → fewer collisions) and
    shrink the radius — the knobs trade recall for candidate volume
    exactly like MinHash band count.

    All fingerprint math is JVM-side bit arithmetic over the shingle
    array (3-gram shingles, not unigrams: the fixture's 31-word
    vocabulary makes unigram sets nearly identical across documents,
    which would collapse every fingerprint into one hamming cluster)."""
    if bands * width != 64:
        raise ValueError("bands * width must tile the 64-bit fingerprint")
    if bands <= radius:
        raise ValueError(
            "pigeonhole guarantee needs bands > radius "
            f"(got bands={bands}, radius={radius})"
        )
    words = F.col("shingles")
    # bit b of a word's hash, tested via a powers-of-two mask array
    # (shift functions need literal counts; masks are data)
    powers = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    bit_votes = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, w: F.zip_with(
            acc,
            F.transform(
                powers,
                lambda m: F.when(F.xxhash64(w).bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
            lambda x, y: x + y,
        ),
    )
    fingerprint = F.aggregate(
        F.zip_with(
            bit_votes,
            powers,
            lambda v, m: F.when(v >= 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    fp = d.select("doc_id", fingerprint.alias("fp"))
    # band on `width`-bit chunks (literal shift counts)
    mask = (1 << width) - 1
    banded = fp.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("fp", b * width).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    other = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fp").alias("fp_b"),
        F.col("band").alias("band2"),
        F.col("band_val").alias("band_val2"),
    )
    hamming = F.bit_count(F.col("fp").bitwiseXOR(F.col("fp_b")))
    return (
        banded.join(
            other,
            (banded.band == other.band2)
            & (banded.band_val == other.band_val2)
            & (banded.doc_id < other.doc_b),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= radius)
        .orderBy("doc_a", "doc_b")
    )


# Edited-plant recall measured with the tuned parameters (8×8, radius
# 7) on the 20 one-token-edited plants: see bound note on the query.
_SIMHASH_EDIT_RECALL_BOUND = 0.7

_SIMHASH_RECALL_ORACLE = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id
    ),
    edits AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id < 20)
    SELECT COUNT(*) AS n_planted_pairs, COUNT(*) AS n_found,
           TRUE AS found_all,
           (SELECT CAST(n AS BIGINT) FROM edits) AS n_edit_pairs,
           TRUE AS edit_recall_ok
    FROM truth
"""


@query("dedup_simhash", oracle=_SIMHASH_RECALL_ORACLE)
def dedup_simhash(spark, sf_dir):
    """SimHash's driver-checked recall CONTRACT row (VERDICT r5 #3 —
    the raw pair list stayed rows-only because xxhash64 bit-slicing has
    no DuckDB equivalent; this row pins the same pipeline to an
    engine-independent truth instead). Two plant classes:

    - 20 EXACT duplicates (doc_id + 1e6, identical text): identical
      shingle set → identical fingerprint → hamming 0 → band collision
      GUARANTEED, so the oracle hard-codes n_found == n_planted_pairs
      and found_all — any fingerprint, banding, or hamming-verify
      regression flips the row red.
    - 20 ONE-TOKEN EDITS (doc_id + 2e6, text + ' zebra' — round-7
      parameter study, VERDICT r6 #7): the realistic near-dup class
      the round-6 parameters (radius 3) caught only ~half of. With the
      tuned 8×8/radius-7 parameters the measured recall is 0.95
      (sf0.001) / 0.90 (sf0.01); `edit_recall_ok` pins recall >= 0.7 —
      under both measurements with fixture-regen margin, ~50% above
      what the un-tuned radius delivered, so a parameter or vote-math
      regression flips it.

    The unit suite additionally pins pair symmetry and the hamming
    bound on the raw `simhash_pairs` output."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plants = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    edits = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zebra")).alias("text"),
    )
    aug = docs.unionByName(plants).unionByName(edits)
    pairs = persist_tracked(simhash_pairs(shingled(aug)).select("doc_a", "doc_b"))
    # Truth universe = docs + plants ONLY, matching the oracle's aug CTE:
    # the ' zebra' edit copies must not enter the exact-dup truth join, or
    # a fixture where two doc_id<20 texts collide would create edit-edit
    # exact pairs counted only Spark-side (ADVICE r7).
    exact_universe = docs.unionByName(plants)
    a = exact_universe.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = exact_universe.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    truth = a.join(
        b, (F.col("ta") == F.col("tb")) & (F.col("doc_a") < F.col("doc_b"))
    ).select("doc_a", "doc_b")
    exact_row = (
        truth.join(pairs.withColumn("_hit", F.lit(1)), ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").alias("n_planted_pairs"),
            F.count("_hit").alias("n_found"),
            (F.count("_hit") == F.count("*")).alias("found_all"),
        )
    )
    edit_truth = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 2000000).alias("doc_b"),
    )
    edit_row = (
        edit_truth.join(
            pairs.withColumn("_hit", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .agg(
            F.count("*").alias("n_edit_pairs"),
            (
                F.count("_hit")
                >= F.lit(_SIMHASH_EDIT_RECALL_BOUND) * F.count("*")
            ).alias("edit_recall_ok"),
        )
    )
    return exact_row.crossJoin(edit_row)


# -- fuzzy decontamination (MinHash-LSH across corpora) -----------------------

_DECON_SLICE = 7  # eval/benchmark slice: doc_id % 7 == 3
_DECON_RESIDUE = 3

_DECON_MINHASH_ORACLE = f"""
    WITH docs AS (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS shingles
      FROM docs
    ),
    tok AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.s = b.s
       AND a.doc_id % {_DECON_SLICE} <> {_DECON_RESIDUE}
       AND b.doc_id % {_DECON_SLICE} = {_DECON_RESIDUE}
      GROUP BY 1, 2
    ),
    hit AS (
      SELECT DISTINCT doc_a AS doc_id FROM inter
      JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
      WHERE i / (len(sa.shingles) + len(sb.shingles) - i) >= {JACCARD_THRESHOLD}
    )
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hit h USING (doc_id)
    WHERE d.doc_id % {_DECON_SLICE} <> {_DECON_RESIDUE}
    """


@query("decontaminate_minhash_lsh", oracle=_DECON_MINHASH_ORACLE)
def decontaminate_minhash_lsh(spark, sf_dir):
    """FUZZY benchmark decontamination — the scale path next to the
    exact n-gram scrub (pipeline_ops.decontaminate_ngram_overlap):
    flag a training document as contaminated when it is a NEAR-dup
    (Jaccard >= {threshold} on 3-gram shingles) of any document in the
    eval/benchmark slice (here doc_id % 7 == 3 stands in for the
    benchmark suite). Exact n-gram overlap misses paraphrased or
    lightly-edited leaks; near-dup matching is how production corpora
    actually scrub (e.g. the GPT-3/Llama decontamination appendices).

    Same machinery and guarantees as dedup_minhash_lsh — ONE shared
    shingle+signature pass over the corpus, but the bucket join is
    train x eval (band collisions across the two sets only, never
    within either side), then exact-Jaccard verification of the
    candidates. Banding b=16/r=4 misses a j>=0.8 pair with p<3e-4, so
    LSH output == exact output holds on the fixture (same argument as
    the dedup oracle). At 100 TB the eval side is a fixed-size suite:
    its bands broadcast, and the train side is touched once."""
    docs = load_table(spark, sf_dir, "documents")
    sh = persist_tracked(shingled(docs))
    sigs = minhash_signatures(sh)
    band_hashes = _band_hash_expr(_BANDS, _ROWS)
    bands = persist_tracked(sigs.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    ))
    is_eval = (F.col("doc_id") % _DECON_SLICE) == _DECON_RESIDUE
    train_bands = bands.filter(~is_eval)
    eval_bands = bands.filter(is_eval).select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band2"),
        F.col("band_hash").alias("band_hash2"),
    )
    cands = (
        train_bands.join(
            eval_bands,
            (train_bands.band == eval_bands.band2)
            & (train_bands.band_hash == eval_bands.band_hash2),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    hits = (
        _verified_pairs(cands, sh, JACCARD_THRESHOLD)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        docs.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("hit"), F.lit(False)).alias("contaminated"),
        )
    )


# -- near-dup CLUSTERING (connected components over the pair graph) -----------

_CLUSTER_ORACLE = f"""
    WITH RECURSIVE base_pairs AS ({_NGRAM_JACCARD_ORACLE}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM base_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM base_pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
    ),
    comp AS (
      SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src
    )
    SELECT c.doc_id, c.component, s.cluster_size
    FROM comp c
    JOIN (
      SELECT component, COUNT(*) AS cluster_size
      FROM comp GROUP BY component
    ) s USING (component)
"""


def min_label_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Connected components over an undirected pair graph via
    hash-to-min label propagation: labels start as own doc_id; each
    round every node takes min(own, neighbors' labels); fixpoint =
    components labeled by their min id (unique, hence deterministic).

    `pairs` has columns (doc_a, doc_b); returns (doc_id, component)
    for every node that appears in at least one pair — callers
    coalesce singletons back to their own id. Rounds are bounded by
    graph diameter (near-dup clusters are shallow: duplicates of one
    source converge in 2-3 rounds; O(log n) with small-star/large-star
    contraction for adversarial chains at 100 TB). Each round is one
    shuffle on the node id; the per-round driver work is a single
    converged-count scalar, and `localCheckpoint` truncates the
    iterative lineage (without it the plan doubles per round).

    Shared by the text (`dedup_cluster_components`), image
    (`dedup_image_ahash`), audio (`dedup_audio_fp`), and video
    (`dedup_video_framehash`) clustering tiers."""
    edges = (
        pairs.union(pairs.select(pairs.columns[1], pairs.columns[0]))
        .toDF("src", "dst")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nb = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb, labels.doc_id == nb.src, "left")
            .select(
                labels.doc_id,
                F.least(
                    labels.component,
                    F.coalesce(F.col("nb_min"), labels.component),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("component labeling did not converge")
    edges.unpersist()
    return labels


def star_components(
    pairs: DataFrame,
    max_alternations: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond", arXiv:1203.5387 lineage) — the O(log n)-
    round algorithm `min_label_components`' docstring defers to for
    adversarial CHAIN graphs, where plain label propagation needs
    diameter rounds (a 1M-link chain at 100 TB = 1M shuffles vs ~40).

    large-star: every node's larger neighbors re-attach to the minimum
    of its closed neighborhood; small-star: every node and its smaller
    neighbors re-attach to their minimum. Both preserve connectivity
    and the component minimum; alternating them contracts every
    component to a star centered at its min id, at which point labels
    read off as min(closed neighborhood). Each operation is one
    node-keyed aggregate + one join — shuffle-bounded, no driver data.

    `pairs` has columns (doc_a, doc_b); returns (doc_id, component)
    for every node appearing in a pair. `stats["alternations"]` gets
    the round count when a dict is passed (tests pin the log bound)."""
    edges = (
        pairs.select(
            F.least(pairs.columns[0], pairs.columns[1]).alias("a"),
            F.greatest(pairs.columns[0], pairs.columns[1]).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def _sym(e):
        return e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )

    def _canon(directed):
        return (
            directed.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _large_star(e):
        sym = _sym(e)
        m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("src", "mn").alias("m"))
        out = (
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        return _canon(out).localCheckpoint()

    def _small_star(e):
        smaller = _sym(e).filter(F.col("dst") < F.col("src"))
        mins = smaller.groupBy("src").agg(F.min("dst").alias("m"))
        re_leaves = (
            smaller.join(mins, "src")
            .filter(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        re_centers = mins.select(
            F.col("src"), F.col("m").alias("dst")
        )
        return _canon(re_leaves.union(re_centers)).localCheckpoint()

    def _changed(old, new):
        if old.count() != new.count():
            return True
        return new.exceptAll(old).limit(1).count() > 0

    rounds = 0
    if edges.limit(1).count() > 0:
        for _ in range(max_alternations):
            rounds += 1
            after_large = _large_star(edges)
            after_small = _small_star(after_large)
            if not _changed(edges, after_large) and not _changed(
                after_large, after_small
            ):
                edges = after_small
                break
            edges = after_small
        else:
            raise RuntimeError("star contraction did not converge")
    if stats is not None:
        stats["alternations"] = rounds
    # at the star fixpoint every component is a star centered at its
    # min id: label = min of the closed neighborhood
    return (
        _sym(edges)
        .groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("doc_id"),
            F.least("src", "mn").alias("component"),
        )
    )


@query("dedup_cluster_components", oracle=_CLUSTER_ORACLE)
def dedup_cluster_components(spark, sf_dir):
    """Near-dup CLUSTERING: connected components over the MinHash-LSH
    pair graph, each document labeled with its component's minimum
    doc_id — the canonical-representative step a dedup pipeline runs
    AFTER pair generation ("keep one doc per duplicate cluster", which
    pairwise output alone cannot express when duplicates chain
    A~B~C without A~C).

    Algorithm: hash-to-min label propagation — labels start as own
    doc_id; each round every node takes min(own, neighbors' labels);
    fixpoint = components labeled by their min id (unique, hence
    deterministic). Rounds are bounded by graph diameter; near-dup
    clusters are shallow (duplicates of one source), so convergence is
    2-3 rounds here and O(log n) with the alternating small-star/
    large-star contraction this would switch to for adversarial chain
    graphs at 100 TB. Each round is one shuffle on the node id; the
    per-round driver work is a single converged-count scalar, and
    `localCheckpoint` truncates the iterative lineage (the standard
    Spark iterative-algorithm pattern — without it the plan doubles
    per round).

    Oracle: DuckDB recursive CTE computing min-reachable-id over the
    exact-Jaccard pair graph (== the LSH graph on this fixture, the
    same equivalence dedup_minhash_lsh's oracle rests on). The label
    propagation itself lives in `min_label_components` (shared with
    the image/audio/video near-dup tiers)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = min_label_components(pairs)
    sizes = labels.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labels.join(sizes, "component")
        .select("doc_id", "component", "cluster_size")
        .orderBy("doc_id")
    )


@query("dedup_cluster_star", oracle=_CLUSTER_ORACLE)
def dedup_cluster_star(spark, sf_dir):
    """Near-dup clustering via STAR CONTRACTION — the same component
    labeling as `dedup_cluster_components` computed by the O(log n)-
    round large-star/small-star algorithm (`star_components`) instead
    of diameter-round label propagation. Registered as its own row so
    the driver value-hashes BOTH kernels against the one recursive-CTE
    truth: identical output by construction (components labeled by
    min id), different distributed algorithm — the one a 100 TB corpus
    with adversarial duplicate CHAINS (A~B~C~... from iterative
    scraping) actually needs, since propagation rounds there equal the
    chain length while contraction stays logarithmic. The log bound
    and union-find equivalence are additionally pinned in
    test_round12_ops.py on a 300-node path graph."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = star_components(pairs)
    sizes = labels.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labels.join(sizes, "component")
        .select("doc_id", "component", "cluster_size")
        .orderBy("doc_id")
    )


# -- exact-substring span dedup (Lee et al. 2021, arXiv:2107.06499) -----------

_SUBSTR_L = 10  # window length in tokens (the paper uses 50 BPE tokens)

_SUBSTR_SPANS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, u.i AS s,
             md5(array_to_string(w[u.i:u.i+{_SUBSTR_L - 1}], ' ')) AS g
      FROM toks CROSS JOIN UNNEST(range(1, len(w) - {_SUBSTR_L - 2})) AS u(i)
      WHERE len(w) >= {_SUBSTR_L}
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
    spans AS (
      SELECT doc_id, s, s + {_SUBSTR_L - 1} AS e
      FROM grams WHERE g IN (SELECT g FROM dup)
    ),
    marked AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                 PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
             THEN 1 ELSE 0 END AS new_island
      FROM spans
    ),
    islands AS (
      SELECT doc_id, s, e,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS isl
      FROM marked
    ),
    merged AS (
      SELECT doc_id, isl, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY doc_id, isl
    ),
    cov AS (
      SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS dup_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM merged GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           c.dup_tokens, c.n_spans,
           ROUND(c.dup_tokens / CAST(len(string_split(d.text, ' '))
                                     AS DOUBLE), 6) AS dup_frac
    FROM cov c JOIN documents d USING (doc_id)
"""


@query("dedup_substring_spans", oracle=_SUBSTR_SPANS_ORACLE)
def dedup_substring_spans(spark, sf_dir):
    """EXACT-SUBSTRING dedup (ExactSubstr, Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better"): mark, per document, the
    token spans that occur verbatim elsewhere in the corpus. The paper
    builds a corpus-wide suffix array; the Spark-native equivalent for a
    fixed match length L is exact and complete: any duplicated substring
    of >= L tokens contains a duplicated L-token window, and the UNION of
    duplicated L-windows covers exactly the duplicated regions — so
    duplicated-window coverage IS the paper's "duplicated span" set at
    granularity L (no false positives: every flagged window literally
    occurs >= 2 times).

    Pipeline (all JVM, one data shuffle + one narrow window):
      1. slide an L-token window per doc (higher-order transform, no UDF),
         keyed by md5(window) so the shuffle ships a fixed-width 32-char
         key, never raw text (at 100 TB: xxhash64 halves it again);
      2. global duplicate-window set = groupBy(hash) HAVING count >= 2 —
         map-side partial counts, shuffle width capped by distinct windows;
      3. left-semi back onto the positions (reuses the same hash
         partitioning, AQE-coalesced), keeping only dup-hit (doc, pos);
      4. per-doc interval merge of overlapping [s, s+L-1] spans —
         gaps-and-islands with a running-max window, partitioned by
         doc_id, so the sort is per-document and only over dup hits
         (a tiny fraction of the corpus).
    Output: per affected doc, merged dup-token coverage + span count +
    coverage fraction — the decision column a pipeline thresholds on
    (the paper removes spans; a filter keeps docs with dup_frac < 0.X).
    """
    L = _SUBSTR_L
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # n_tokens rides the pre-explode stage (the split array is already
    # materialized there) — no persist of raw text, no second scan; docs
    # shorter than L can never reach cov (zero windows), so the filtered
    # frame covers every joinable doc_id
    wd = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= L
    )
    win_hashes = F.transform(
        F.sequence(F.lit(1), F.size("w") - (L - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice("w", i, L))),
    )
    grams = wd.select(
        "doc_id", F.posexplode(win_hashes).alias("p0", "g")
    ).select("doc_id", (F.col("p0") + 1).alias("s"), "g")
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("g")
    )
    spans = grams.join(dup, "g", "left_semi").select(
        "doc_id", "s", (F.col("s") + (L - 1)).alias("e")
    )
    from pyspark.sql import Window as W

    w_prev = (
        W.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = spans.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = (
        W.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = marked.withColumn("isl", F.sum("new_island").over(w_run))
    cov = (
        islands.groupBy("doc_id", "isl")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("me") - F.col("ms") + 1).alias("dup_tokens"),
            F.count("*").alias("n_spans"),
        )
    )
    n_tok = wd.select(
        "doc_id", F.size("w").cast("long").alias("n_tokens")
    )
    return cov.join(n_tok, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.round(
            F.col("dup_tokens") / F.col("n_tokens").cast("double"), 6
        ).alias("dup_frac"),
    )


CONTAINMENT_THRESHOLD = 0.8
_EXCERPT_WORDS = 15  # prefix length of the planted excerpt copies

_CONTAINMENT_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000,
             array_to_string(list_slice(string_split(text, ' '),
                                        1, {_EXCERPT_WORDS}), ' ')
      FROM documents WHERE doc_id < 20
    ),
    docs AS (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM aug),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS shingles
      FROM docs
    ),
    tok AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS lo, b.doc_id AS hi, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    directed AS (
      SELECT lo AS doc_a, hi AS doc_b, i FROM inter
      UNION ALL
      SELECT hi, lo, i FROM inter
    )
    SELECT doc_a, doc_b,
           ROUND(i * 1.0 / len(sa.shingles), 6) AS containment
    FROM directed
    JOIN sh sa ON sa.doc_id = doc_a
    WHERE len(sa.shingles) > 0
      AND i * 1.0 / len(sa.shingles) >= {CONTAINMENT_THRESHOLD}
    """


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark, sf_dir):
    """DIRECTIONAL shingle CONTAINMENT dedup: C(A->B) = |A∩B| / |A| over
    3-gram shingle sets — the asymmetric companion to
    `dedup_ngram_jaccard` that catches SUBSET duplication (an excerpt,
    a quoted passage, a truncated crawl of a page) which symmetric
    Jaccard misses entirely: a 15-word prefix of a 40-word page scores
    Jaccard ~0.3 but containment 1.0 in the excerpt->original
    direction. The fixture plants a {_EXCERPT_WORDS}-word prefix
    excerpt of every doc_id < 20 (id + 3e6); each must surface with
    containment 1.0 toward its source, and the reverse direction must
    stay below threshold — both directions of every undirected
    candidate are scored, from ONE inverted-index intersection pass
    (same capped index as the Jaccard path: one explode + one
    equi-join + one groupBy, no all-pairs anything). Weights and
    intersections are integer-exact; the ratio is one IEEE division
    rounded to 6 dp in both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    excerpts = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split("text", " "), 1, _EXCERPT_WORDS), " "
        ).alias("text"),
    )
    sh = persist_tracked(shingled(docs.unionByName(excerpts)))
    return containment_pairs(sh, CONTAINMENT_THRESHOLD, SHINGLE_DF_CAP)


def containment_pairs(
    sh: DataFrame, threshold: float, df_cap: int | None = None
) -> DataFrame:
    """Directional containment pairs C(A->B) = |A∩B| / |A| from a
    shingled frame, via the SAME DF-capped inverted index as
    `ngram_jaccard_pairs` (VERDICT r8 #2: the uncapped self-join gave a
    hot shingle with document frequency f an f² candidate fan-out).

    Exactness under the cap: with H = count of distinct hot shingles
    excluded from the index, a pair's true intersection i satisfies
    i_rare <= i <= i_rare + H, so (i_rare + H)/|A| upper-bounds its
    containment — candidates below threshold on the bound are pruned
    exactly. When H = 0 the bound IS the exact containment and no
    verify pass runs; when H > 0 survivors are re-scored from the full
    shingle sets (candidate count bounded by cap·|tokens|, not Σ f²).
    A pair is missed only if ALL its shared shingles are hot — the
    same stop-shingle tradeoff the Jaccard path documents.

    Round 15 (guide §2.3/§2.4, the Jaccard kernel's sizes-carry applied
    here): both docs' set sizes ride the exploded token rows and survive
    the candidate aggregation as min(), so the post-union doc-keyed size
    join is gone; the directed union just picks its own side's size.
    Same ints, same containment, same pairs (the old `na > 0` filter was
    vacuous — a doc reaches `inter` only by exploding ≥1 shingle)."""
    tok_all = sh.select(
        "doc_id",
        F.size("shingles").alias("na"),
        F.explode("shingles").alias("s"),
    )
    n_hot = 0
    tok = tok_all
    if df_cap is not None:
        dfreq = tok_all.groupBy("s").agg(F.count("*").alias("df"))
        # persist before count: same double-plan guard as the Jaccard
        # kernel above — the anti-join re-consumes `hot` on both sides
        # of the self-join when n_hot > 0.
        hot = persist_tracked(dfreq.filter(F.col("df") > df_cap))
        n_hot = hot.count()  # scalar plan constant (tiny agg job)
        if n_hot:
            tok = tok_all.join(hot.select("s"), "s", "left_anti")
    t2 = tok.select(
        F.col("doc_id").alias("hi"),
        F.col("na").alias("n_hi"),
        F.col("s").alias("s2"),
    )
    inter = (
        tok.join(t2, (F.col("s") == F.col("s2")) & (F.col("doc_id") < F.col("hi")))
        .groupBy(F.col("doc_id").alias("lo"), "hi")
        .agg(
            F.count("*").alias("i"),
            F.min("na").alias("n_lo"),  # constant per lo — min IS the value
            F.min("n_hi").alias("n_hi"),
        )
    )
    # Round 15 (guide §2.4/§7.2): the directed view used to be a UNION
    # of two selects over `inter` — and Catalyst duplicates the whole
    # inverted-index self-join + aggregation subtree under each union
    # branch (the committed before-plan shows two full HashAggregate/
    # BroadcastHashJoin chains), so the expensive Σdf² candidate pass
    # ran TWICE. One inline explode emits both directions from a single
    # pass — no union, no persist barrier (the r14 substring lesson:
    # materialization would cost more than this stays fused).
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("lo").alias("doc_a"),
                    F.col("hi").alias("doc_b"),
                    F.col("i").alias("i"),
                    F.col("n_lo").alias("na"),
                ),
                F.struct(
                    F.col("hi").alias("doc_a"),
                    F.col("lo").alias("doc_b"),
                    F.col("i").alias("i"),
                    F.col("n_hi").alias("na"),
                ),
            )
        ).alias("e")
    ).select("e.doc_a", "e.doc_b", "e.i", "e.na")
    cands = directed.filter(
        (F.col("i") + n_hot) / F.col("na") >= threshold
    )
    if n_hot == 0:
        return cands.select(
            "doc_a",
            "doc_b",
            F.round(F.col("i") / F.col("na"), 6).alias("containment"),
        )
    # hot shingles were excluded — re-score survivors from full sets
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    c = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
    return (
        cands.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("containment", F.round(c, 6))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


_SOFT_WEIGHTS_ORACLE = """
    WITH docs AS (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS shingles
      FROM docs
    ),
    tok AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    dfreq AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY s)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(d.df) AS BIGINT) AS sum_df,
           ROUND(SUM(d.df) * 1.0 / COUNT(*), 6) AS commonness,
           ROUND(COUNT(*) * 1.0 / SUM(d.df), 6) AS soft_weight
    FROM tok t JOIN dfreq d USING (s)
    GROUP BY t.doc_id
    """


@query("dedup_soft_weights", oracle=_SOFT_WEIGHTS_ORACLE)
def dedup_soft_weights(spark, sf_dir):
    """SOFT dedup by REWEIGHTING (SoftDeDup, Xue et al. ACL 2024 —
    arXiv:2401.00968): instead of hard-dropping near-duplicates, score
    each document's COMMONNESS (mean document-frequency of its 3-gram
    shingles) and emit a sampling weight 1/commonness — duplicated
    content trains at reduced weight rather than being deleted, which
    the paper shows beats hard dedup at equal compute. Cost is the
    cheap HALF of the dedup stack: one shingle explode, one
    document-frequency groupBy, one join back — NO pairwise
    candidate generation at all, so it scales to any corpus a groupBy
    scales to. Determinism: df and shingle counts are exact integers
    (< 2^53); both ratios are one IEEE division rounded to 6 dp.
    Hard-dedup companion queries: `dedup_exact`, `dedup_minhash_lsh`."""
    sh = shingled(load_table(spark, sf_dir, "documents"))
    tok = sh.select("doc_id", F.explode("shingles").alias("s"))
    dfreq = tok.groupBy("s").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tok.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("sum_df"),
            F.round(F.sum("df") / F.count("*"), 6).alias("commonness"),
            F.round(F.count("*") / F.sum("df"), 6).alias("soft_weight"),
        )
    )


_BBIT = 2  # bits kept per permutation: 64 perms x 2 bits = 16 B/signature
_BBIT_TOL = 0.3  # |b-bit estimate - exact Jaccard| bound (see measurement)

_BBIT_ORACLE = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000, text || ' zebra'
      FROM documents WHERE doc_id < 20
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM aug)
    ),
    prs AS (
      SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
      FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id, doc_id + 2000000 FROM documents WHERE doc_id < 20
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                 (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 6)
             AS jaccard,
           TRUE AS bbit_within_tol
    FROM prs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b
    """


@query("dedup_bbit_minhash", oracle=_BBIT_ORACLE)
def dedup_bbit_minhash(spark, sf_dir):
    """b-BIT MINHASH resemblance estimation (Li & Konig, WWW 2010):
    keep only the lowest b=2 bits of each of the 64 minhash values —
    16 bytes per signature instead of 512, the 32x storage cut that
    makes billion-document signature tables RAM-resident — and
    estimate resemblance from the matching-slot fraction with the
    collision correction R = (P - 2^-b) / (1 - 2^-b). The contract:
    for 40 planted pairs spanning both duplicate classes (20 exact
    copies, J = 1; 20 one-token edits, J ~ 0.9), the b-bit estimate
    lands within 0.3 of the exact Jaccard the oracle recomputes
    from full shingle sets (estimator std at 64 perms is ~0.04; exact
    copies estimate exactly 1). Signatures come from the SAME
    `minhash_signatures` family the LSH path banded — b-bit slicing
    is a post-processing of signatures a pipeline already has."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plants = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    edits = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zebra")).alias("text"),
    )
    aug = docs.unionByName(plants).unionByName(edits)
    sh = persist_tracked(shingled(aug))
    sigs = minhash_signatures(sh)
    base = docs.filter(F.col("doc_id") < 20).select("doc_id")
    prs = base.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 2000000).alias("doc_b"),
        )
    )
    # expr-built (r14): the 64-column alias lists and the 64-term match
    # sum cost ~1300 Column-API py4j round-trips of driver time;
    # parsed SQL builds the identical expressions in a handful.
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.expr(f"s{p} AS a{p}") for p in range(_N_PERM)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.expr(f"s{p} AS b{p}") for p in range(_N_PERM)],
    )
    mask = (1 << _BBIT) - 1
    matches = F.lit(0) + F.expr(
        " + ".join(
            f"CAST(((a{p} & {mask}) = (b{p} & {mask})) AS INT)"
            for p in range(_N_PERM)
        )
    )
    c = 1.0 / (1 << _BBIT)
    est = (matches / F.lit(float(_N_PERM)) - F.lit(c)) / F.lit(1.0 - c)
    ja = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    jb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        prs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est", est)
        .join(ja, "doc_a")
        .join(jb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
            (
                F.abs(F.col("est") - inter / union) <= F.lit(_BBIT_TOL)
            ).alias("bbit_within_tol"),
        )
    )


# -- URL / host-level dedup (round 9) ------------------------------------------


_URL_DEDUP_ORACLE = """
    WITH urls AS (
      SELECT doc_id * 10 + 0 AS url_id,
             'https://Example.COM/page/' || doc_id AS url
      FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT doc_id * 10 + 1,
             'https://www.example.com/page/' || doc_id || '/'
      FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT doc_id * 10 + 2,
             'http://example.com/page/' || doc_id
               || '?utm_source=feed&utm_medium=rss'
      FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT doc_id * 10 + 3,
             'https://example.com/page/' || doc_id || '#section-2'
      FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT doc_id * 10 + 9,
             'https://host' || (doc_id % 7) || '.org/doc/' || doc_id
      FROM documents
    ),
    stripped AS (
      SELECT url_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '#.*$', ''),
                 '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
               '^https?://', '') AS u
      FROM urls
    ),
    canon AS (
      SELECT url_id,
             regexp_replace(lower(regexp_extract(u, '^([^/]+)', 1)),
                            '^www\\.', '')
               || regexp_replace(substr(u, 1 + length(regexp_extract(u, '^([^/]+)', 1))),
                                 '/$', '') AS canonical_url,
             regexp_replace(lower(regexp_extract(u, '^([^/]+)', 1)),
                            '^www\\.', '') AS host
      FROM stripped
    )
    SELECT canonical_url, host,
           CAST(MIN(url_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM canon
    GROUP BY canonical_url, host
    """


@query("dedup_url_host", oracle=_URL_DEDUP_ORACLE)
def dedup_url_host(spark, sf_dir):
    """URL-LEVEL dedup with canonicalization — the cheapest and
    first-run dedup stage of every web-crawl pipeline (CCNet, RefinedWeb,
    FineWeb all key their first pass on the normalized URL): strip
    fragment, strip utm_* tracking params, strip scheme, lowercase the
    host, drop a leading `www.`, drop a trailing slash — then exact-dedup
    on the canonical form, keep-first. The fixture (documents has no URL
    column) synthesizes a deterministic URL corpus with four planted
    variants per doc_id < 25 (host-case, www+slash, scheme+tracking
    params, fragment) that MUST collapse to one canonical each, plus one
    unique URL per doc as negatives. Everything is JVM-side string/regex
    work + one groupBy keyed on the canonical URL — the `dedup_exact`
    shape, shuffle width capped by distinct-URL count; at 100 TB this
    runs before any content hash is ever computed. The `host` column
    doubles as the key for host-level rollups (crawl budgeting,
    robots-denial audits)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    lt = d.filter(F.col("doc_id") < 25)
    did = F.col("doc_id").cast("string")
    variants = [
        lt.select(
            (F.col("doc_id") * 10 + 0).alias("url_id"),
            F.concat(F.lit("https://Example.COM/page/"), did).alias("url"),
        ),
        lt.select(
            (F.col("doc_id") * 10 + 1).alias("url_id"),
            F.concat(
                F.lit("https://www.example.com/page/"), did, F.lit("/")
            ).alias("url"),
        ),
        lt.select(
            (F.col("doc_id") * 10 + 2).alias("url_id"),
            F.concat(
                F.lit("http://example.com/page/"),
                did,
                F.lit("?utm_source=feed&utm_medium=rss"),
            ).alias("url"),
        ),
        lt.select(
            (F.col("doc_id") * 10 + 3).alias("url_id"),
            F.concat(
                F.lit("https://example.com/page/"), did, F.lit("#section-2")
            ).alias("url"),
        ),
        d.select(
            (F.col("doc_id") * 10 + 9).alias("url_id"),
            F.concat(
                F.lit("https://host"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".org/doc/"),
                did,
            ).alias("url"),
        ),
    ]
    urls = variants[0]
    for v in variants[1:]:
        urls = urls.unionByName(v)
    u = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("url"), "#.*$", ""),
            r"[?&]utm_[a-z]+=[^&#]*",
            "",
        ),
        "^https?://",
        "",
    )
    stripped = urls.select("url_id", u.alias("u"))
    raw_host = F.regexp_extract(F.col("u"), "^([^/]+)", 1)
    host = F.regexp_replace(F.lower(raw_host), r"^www\.", "")
    path = F.regexp_replace(
        F.expr("substr(u, 1 + length(regexp_extract(u, '^([^/]+)', 1)))"),
        "/$",
        "",
    )
    canon = stripped.select(
        "url_id",
        F.concat(host, path).alias("canonical_url"),
        host.alias("host"),
    )
    return canon.groupBy("canonical_url", "host").agg(
        F.min("url_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


# -- cross-source duplicate overlap matrix (round 9) ---------------------------


_XSRC_ORACLE = """
    WITH aug AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 5000000, text, 'mirror_a'
      FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 6000000, text, 'mirror_b'
      FROM documents WHERE doc_id < 10
    ),
    h AS (SELECT md5(text) AS h, source, doc_id FROM aug)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(DISTINCT a.h) AS BIGINT) AS shared_contents,
           CAST(COUNT(*) AS BIGINT) AS dup_doc_pairs
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    """


@query("dedup_cross_source_overlap", oracle=_XSRC_ORACLE)
def dedup_cross_source_overlap(spark, sf_dir):
    """CROSS-SOURCE duplicate OVERLAP MATRIX — the "which crawls
    re-collected the same pages" audit a mixture designer reads before
    weighting sources (two crawls with 40% content overlap are NOT two
    independent datasets): for every source pair sharing at least one
    exact-duplicate content, the count of shared distinct contents and
    of duplicate doc pairs. The fixture has no natural cross-source
    dupes, so two mirror sources are planted (doc_id < 20 re-sourced as
    `mirror_a`, doc_id < 10 as `mirror_b`) — every planted content must
    surface against its original's source, and mirror_a∩mirror_b must
    report exactly the 10 shared contents. Shape: per-(content, source)
    copy counts FIRST (one map-side-combinable groupBy), THEN the
    self-join on the content hash over the COUNT frame — a content with
    f total copies fans out to at most |sources-carrying-it|² count
    rows, never f² doc pairs (the hot-key discipline the containment
    fix installed, applied here BEFORE the operator ever meets a skewed
    corpus); dup_doc_pairs = Σ n_a·n_b is exact from the counts. Final
    rollup on the tiny (source, source) key space."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            "text",
            F.lit("mirror_a").alias("source"),
        )
    ).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 6000000).alias("doc_id"),
            "text",
            F.lit("mirror_b").alias("source"),
        )
    )
    # persisted: both sides of the self-join consume this frame (one
    # corpus scan + hash aggregation instead of two)
    counts = persist_tracked(aug.groupBy(F.md5("text").alias("h"), "source").agg(
        F.count("*").alias("n")
    ))
    a = counts.select(
        "h", F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    b = counts.select(
        F.col("h").alias("h2"),
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(
            b,
            (F.col("h") == F.col("h2"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.countDistinct("h").alias("shared_contents"),
            F.sum(F.col("n_a") * F.col("n_b")).alias("dup_doc_pairs"),
        )
    )


# -- character-level edit-distance verification (round 9) ------------------------


_EDIT_SUFFIX = " zebra"  # 6-char planted edit (the b-bit/simhash plant class)


@query(
    "dedup_edit_distance",
    oracle=f"""
    WITH pairs AS (
      SELECT a.doc_id AS doc_a, a.doc_id + 2000000 AS doc_b,
             a.text AS ta, a.text || '{_EDIT_SUFFIX}' AS tb
      FROM documents a WHERE a.doc_id < 20
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance,
           ROUND(1.0 - levenshtein(ta, tb) * 1.0 /
                 GREATEST(LENGTH(ta), LENGTH(tb)), 6) AS similarity,
           (levenshtein(ta, tb) = {len(_EDIT_SUFFIX)}) AS is_suffix_edit
    FROM pairs
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """CHARACTER-LEVEL edit-distance verification — the last tier of
    the near-dup ladder (shingle Jaccard and minhash see token sets;
    Levenshtein sees the characters, catching intra-word edits and
    quantifying HOW different a candidate pair is before a keep/drop
    decision). Scored over the same planted one-token-edit pairs the
    b-bit/simhash contracts use: each ' zebra'-suffixed copy must
    measure exactly {len(_EDIT_SUFFIX)} edits, pinning both engines'
    DP implementations against each other on real corpus text.
    Scale shape: edit distance is O(|a|·|b|) per PAIR — it only ever
    runs on CANDIDATES another stage generated (here the planted
    pairs; in production the LSH/containment survivors), never as a
    corpus-level join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 2000000).alias("doc_b"),
        F.col("text").alias("ta"),
        F.concat("text", F.lit(_EDIT_SUFFIX)).alias("tb"),
    )
    d = F.levenshtein("ta", "tb")
    return pairs.select(
        "doc_a",
        "doc_b",
        d.cast("long").alias("edit_distance"),
        F.round(
            F.lit(1.0)
            - d * F.lit(1.0) / F.greatest(F.length("ta"), F.length("tb")),
            6,
        ).alias("similarity"),
        (d == len(_EDIT_SUFFIX)).alias("is_suffix_edit"),
    )


# -- token-sort fingerprint dedup (round 10) -----------------------------------------


@query(
    "dedup_token_sort_key",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS key_hash
      FROM documents
    )
    SELECT key_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS survivor_id
    FROM k GROUP BY key_hash HAVING COUNT(*) >= 2
    """,
)
def dedup_token_sort_key(spark, sf_dir):
    """TOKEN-SORT fingerprint dedup (fuzzywuzzy's token_sort_ratio at
    exact-match strength): the key is the md5 of the document's sorted
    DISTINCT token set, so word-order permutations and repetition-count
    differences collapse to one group — a strictly coarser key than
    dedup_exact's content hash, one notch before Jaccard similarity.
    Sits in the cascade between exact dedup and MinHash: it catches the
    shuffled-boilerplate duplicates LSH spends candidate pairs on, for
    one map-side key computation. Scale: pure JVM expressions
    (split/array_distinct/array_sort/md5) and ONE hash-key groupBy —
    identical posture to dedup_exact, no pair space at all."""
    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            )
        ).alias("key_hash"),
    )
    return (
        k.groupBy("key_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("survivor_id"))
        .filter(F.col("n_docs") >= 2)
    )


# -- shingle-size sensitivity audit (round 10, wave 7) -------------------------------


@query(
    "pipeline_shingle_sensitivity",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ks AS (SELECT UNNEST([3, 5, 8]) AS k),
    grams AS (
      SELECT DISTINCT k, doc_id,
             array_to_string(list_slice(w, i, i + k - 1), ' ') AS g
      FROM docs, ks, UNNEST(generate_series(1, len(w) - k + 1)) AS t(i)
      WHERE len(w) >= k
    ),
    df AS (SELECT k, g, COUNT(*) AS df FROM grams GROUP BY 1, 2)
    SELECT CAST(k AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(count_if(df > 50) AS BIGINT) AS n_hot,
           CAST(SUM(CASE WHEN df <= 50 THEN df*(df-1)//2 ELSE 0 END)
                AS BIGINT) AS candidate_pairs
    FROM df GROUP BY k
    """,
)
def pipeline_shingle_sensitivity(spark, sf_dir):
    """SHINGLE-SIZE sensitivity audit for the near-dup cascade: for
    k ∈ {3,5,8}-gram shingles, the distinct shingle count, the HOT
    shingles an inverted index must cap (df > 50, the dedup family's
    stop-shingle rule), and the candidate-pair workload Σ df·(df−1)/2
    the capped index would generate. This is the measurement that picks
    k before running dedup_ngram_jaccard at corpus scale — small k
    floods the index with generic shingles, large k misses short
    overlaps. Crucially the pair count comes from the DOC-FREQUENCY
    table alone (sum of df-choose-2), so the audit NEVER materializes a
    candidate pair: shingle-keyed aggregations only."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    # unrolled element_at k-gram (the bigram idiom). NB: pyspark
    # higher-order-function lambdas are ARITY-inspected — a default arg
    # (lambda i, kk=k) binds kk to the element index, so close over k
    # through a factory instead
    def _kgram(kk):
        return lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j + 1) for j in range(kk)]
        )

    frames = []
    for k in (3, 5, 8):
        grams = F.transform(F.sequence(F.lit(0), F.size(w) - k), _kgram(k))
        frames.append(
            d.filter(F.size(w) >= k)
            .select(
                F.lit(k).alias("k"), "doc_id", F.explode(grams).alias("g")
            )
            .distinct()
        )
    all_grams = frames[0].unionAll(frames[1]).unionAll(frames[2])
    df = all_grams.groupBy("k", "g").agg(F.count("*").alias("df"))
    pairs = F.when(
        F.col("df") <= 50, F.expr("df * (df - 1) div 2")
    ).otherwise(F.lit(0))
    return df.groupBy("k").agg(
        F.count("*").alias("n_shingles"),
        F.count_if(F.col("df") > 50).alias("n_hot"),
        F.sum(pairs).alias("candidate_pairs"),
    )


# -- duplicate-cluster size histogram (round 10, wave 13) ----------------------------


@query(
    "dedup_cluster_size_histogram",
    oracle="""
    WITH k AS (
      SELECT md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
      FROM documents
    ),
    g AS (SELECT h, COUNT(*) AS sz FROM k GROUP BY h)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM g GROUP BY sz
    """,
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """DUPLICATE-CLUSTER size distribution under the token-sort key —
    the multiplicity histogram that sizes a dedup run before it starts:
    how many singletons pass untouched, how many small clusters need a
    survivor pick, and whether a mega-cluster (boilerplate bomb) exists
    that deserves its own code path. Also the denominator audit for
    dedup rates: Σ(size·clusters) must equal the corpus. Scale: the
    same one-key groupBy as dedup_token_sort_key plus a size-keyed
    re-aggregation — two keyed shuffles, the second over cluster-count
    cardinality."""
    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            )
        ).alias("h")
    )
    g = k.groupBy("h").agg(F.count("*").alias("sz"))
    return g.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
    )


# -- prefix-key dedup (round 10, wave 14) --------------------------------------------


@query(
    "dedup_prefix_key",
    oracle="""
    WITH k AS (SELECT doc_id, md5(substr(text, 1, 256)) AS h FROM documents)
    SELECT h AS prefix_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS survivor_id
    FROM k GROUP BY h HAVING COUNT(*) >= 2
    """,
)
def dedup_prefix_key(spark, sf_dir):
    """PREFIX-KEY dedup: md5 of the first 256 characters — the CCNet/
    RefinedWeb trick that catches TRUNCATION duplicates (same page
    fetched to different depths, feeds cut mid-article) which full-hash
    dedup misses by construction and near-dup only finds at quadratic
    candidate cost. Slots into the cascade right after dedup_exact:
    same one-key groupBy posture, one substring + hash per document,
    zero pair space. Groups report survivor = min(doc_id), matching the
    cascade's survivor convention."""
    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id", F.md5(F.substring("text", 1, 256)).alias("h")
    )
    return (
        k.groupBy(F.col("h").alias("prefix_hash"))
        .agg(
            F.count("*").alias("n_docs"), F.min("doc_id").alias("survivor_id")
        )
        .filter(F.col("n_docs") >= 2)
    )


# -- MinHash band-count sweep (round 10, wave 16) ------------------------------------

#: (bands, rows) configs tiling the 64-perm signature, narrow → wide.
#: Theory at the j=0.8 threshold: P(collide) = 1-(1-j^r)^b ≈ 0.77 /
#: 0.9998 / 1-6e-15 — recall must be non-decreasing left to right.
_BAND_SWEEP = [(8, 8), (16, 4), (32, 2)]

_BAND_SWEEP_CONTRACT_SQL = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(COUNT(*) AS BIGINT) AS hits_widest,
           TRUE AS monotone_ok,
           TRUE AS widest_exact
    FROM ({_NGRAM_JACCARD_ORACLE})
"""


@query("dedup_minhash_band_sweep", oracle=_BAND_SWEEP_CONTRACT_SQL)
def dedup_minhash_band_sweep(spark, sf_dir):
    """MINHASH BANDING SWEEP — the third leg of the tuning-audit triad
    (IVF probe sweep / shingle-size sensitivity / THIS): rerun the LSH
    candidate stage at (bands, rows) = {(8,8), (16,4), (32,2)} over ONE
    shared signature table and measure exact-verified recall against
    the exact-Jaccard truth. Pins the two properties a correct banding
    must show: recall NON-DECREASING as bands widen (the s-curve only
    steepens — a violation means band hashing or dedup is broken) and
    the widest config EXACT (miss probability (1-0.8²)³² ≈ 6e-15).

    VERDICT r10 #3: `hits_widest` is the MEASURED verified-hit count of
    the widest config, emitted as a data column the oracle pins to the
    DuckDB truth count — a banding regression now changes a visible
    number (and flips widest_exact), instead of hiding behind a
    hard-coded TRUE. The narrower configs' counts aren't SQL-expressible
    (xxhash64 banding) so they stay out of the driver row; the invariant
    test pins all three against a pure-Python MinHash ground truth.
    Cost: |sweep| passes over the persisted signature frame — a tuning
    job, not a serving path."""
    truth = persist_tracked(
        dedup_ngram_jaccard.__wrapped__(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
    )
    n_truth = truth.count()
    sh = persist_tracked(shingled(load_table(spark, sf_dir, "documents")))
    sigs = persist_tracked(minhash_signatures(sh))
    hits = []
    for n_bands, n_rows in _BAND_SWEEP:
        band_hashes = _band_hash_expr(n_bands, n_rows)
        bands = sigs.select(
            "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
        )
        other = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("band").alias("band2"),
            F.col("band_hash").alias("band_hash2"),
        )
        cands = (
            bands.join(
                other,
                (bands.band == other.band2)
                & (bands.band_hash == other.band_hash2)
                & (bands.doc_id < other.doc_b),
            )
            .select(F.col("doc_id").alias("doc_a"), "doc_b")
            .distinct()
        )
        verified = _verified_pairs(cands, sh, JACCARD_THRESHOLD)
        hits.append(
            truth.join(verified, ["doc_a", "doc_b"], "left_semi").count()
        )
    monotone = all(hits[i] <= hits[i + 1] for i in range(len(hits) - 1))
    # stash the full per-config measurements for the invariant test
    dedup_minhash_band_sweep.last_hits = dict(zip(_BAND_SWEEP, hits))
    return truth.agg(
        F.count("*").alias("n_truth"),
        F.lit(int(hits[-1])).cast("long").alias("hits_widest"),
        F.lit(bool(monotone)).alias("monotone_ok"),
        F.lit(bool(hits[-1] == n_truth)).alias("widest_exact"),
    )


# -- cross-run incremental dedup (round 11) -------------------------------------------

_DEDUP_INC_ORACLE = f"""
    WITH t AS (SELECT doc_id, text, (doc_id % 2 = 0) AS is_even FROM documents),
    odd_docs AS (SELECT doc_id, text FROM t WHERE NOT is_even),
    exact_dups AS (
      SELECT o.doc_id FROM odd_docs o
      WHERE EXISTS (SELECT 1 FROM t e WHERE e.is_even AND e.text = o.text)
         OR EXISTS (SELECT 1 FROM odd_docs o2
                    WHERE o2.text = o.text AND o2.doc_id < o.doc_id)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t WHERE is_even) AS n_initial_docs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM odd_docs) AS n_new_docs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact_dups) AS n_exact_dups_new,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_NGRAM_JACCARD_ORACLE})
       WHERE doc_a % 2 = 1 OR doc_b % 2 = 1) AS n_near_pairs_new,
      TRUE AS hash_state_matches,
      TRUE AS band_state_matches
"""


def _band_rows_from_shingled(sh: DataFrame) -> DataFrame:
    """(band, band_hash, doc_id) LSH postings for an already-shingled
    frame — the persisted form of the MinHash band index (b=16, r=4,
    the production banding)."""
    sigs = minhash_signatures(sh)
    band_hashes = _band_hash_expr(_BANDS, _ROWS)
    return sigs.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    ).select(F.col("band").cast("int").alias("band"), "band_hash", "doc_id")


def _band_rows(df: DataFrame) -> DataFrame:
    return _band_rows_from_shingled(shingled(df))


# serve benches reuse the tables the build bench just wrote (the
# `_mor_dv_fixture` pattern in sql_surface.py) — keyed by sf_dir,
# values are the three table locations (corpus, hashes, bands)
_INC_DEDUP_FIXTURE: dict[str, tuple[str, str, str]] = {}


def _inc_dedup_tables(spark, sf_dir, fresh: bool = False):
    """Build (or reuse) the three persisted dedup-state snapshot tables
    — corpus (two appends: even then odd doc_ids), exact-hash FCFS
    state (content_hash, keep_id), MinHash band postings (band,
    band_hash, doc_id) — returning SnapshotTable handles.

    fresh=True always writes brand-new tables under unique paths (the
    BUILD bench: isolates commit-protocol + state-write cost from the
    serve path) and records them in the module cache so a SERVE call
    in the same session reuses them warm. fresh=False prefers the
    cache, else `build_once` under the shared warehouse paths."""
    import os
    import uuid as _uuid

    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources.snapshot_table import (
        SnapshotTable,
        build_once,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    with _lock:
        if not fresh and sf_dir in _INC_DEDUP_FIXTURE:
            return tuple(
                SnapshotTable.load(spark, loc)
                for loc in _INC_DEDUP_FIXTURE[sf_dir]
            )
        wh = warehouse_dir(sf_dir)
        token = _uuid.uuid4().hex[:8]

        def make(name, builder, schema):
            if fresh:
                loc = os.path.join(wh, f"{name}_{token}")
                t = SnapshotTable.create(spark, loc, schema=schema)
                builder(t)
                return t
            return build_once(
                spark, os.path.join(wh, name), builder, schema=schema
            )

        even = F.col("doc_id") % 2 == 0

        def build_corpus(t):
            t.append(d.filter(even))
            t.append(d.filter(~even))

        # Round 13 (VERDICT r12 #5): hash/band state derives from the
        # SAME in-memory halves the corpus appends wrote (bit-identical
        # rows) instead of re-scanning the fresh table, and each heavy
        # pass (md5, shingle+minhash banding) runs ONCE over the whole
        # corpus, persisted, with the two per-batch appends as filters
        # of it — the build bench times state writes + commits, not
        # redundant recompute. The serve path still exercises the real
        # scan/scan_changes lifecycle, and its rebuild audits would
        # catch any drift between written state and corpus content.
        hashed = persist_tracked(
            d.select("doc_id", F.md5("text").alias("content_hash"))
        )

        def build_hash_state(t):
            state1 = persist_tracked(
                hashed.filter(even)
                .groupBy("content_hash")
                .agg(F.min("doc_id").alias("keep_id"))
            )
            t.append(state1)
            # FCFS: drop hashes the stored state already owns, then
            # keep-first within the new batch
            t.append(
                hashed.filter(~even)
                .join(state1, "content_hash", "left_anti")
                .groupBy("content_hash")
                .agg(F.min("doc_id").alias("keep_id"))
            )

        bands_all = persist_tracked(_band_rows(d))

        def build_band_state(t):
            t.append(bands_all.filter(even))
            t.append(bands_all.filter(~even))  # refresh = O(new rows)

        # The three state tables are mutually independent (corpus from
        # `d`, hash state from `hashed`, bands from `bands_all`; each
        # commits to its OWN location/lock), so build them from a small
        # thread pool — guide §2.6: the six sequential commits left the
        # executors idle in every commit-protocol gap, and overlapping
        # the jobs lets one table's write back-fill another's gap.
        # Results are unaffected: per-table snapshot ids and contents
        # never depend on cross-table ordering.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_corpus = pool.submit(
                make, "dedup_inc_corpus", build_corpus,
                "doc_id long, text string",
            )
            f_hash = pool.submit(
                make, "dedup_inc_hashes", build_hash_state,
                "content_hash string, keep_id long",
            )
            f_band = pool.submit(
                make, "dedup_inc_bands", build_band_state,
                "band int, band_hash long, doc_id long",
            )
        corpus_t = f_corpus.result()
        hash_t = f_hash.result()
        band_t = f_band.result()
        _INC_DEDUP_FIXTURE[sf_dir] = (
            corpus_t.location,
            hash_t.location,
            band_t.location,
        )
    return corpus_t, hash_t, band_t


@query("dedup_incremental_snapshot", oracle=_DEDUP_INC_ORACLE)
def dedup_incremental_snapshot(spark, sf_dir):
    """CROSS-RUN INCREMENTAL DEDUP (VERDICT r10 #8) — the lifecycle the
    BM25/IVF tiers already follow, applied to the dedup cascade: the
    exact-hash table (content_hash, keep_id) and the MinHash BAND table
    (band, band_hash, doc_id) are persisted as snapshot tables in the
    warehouse; when a NEW corpus batch arrives (a second append to the
    corpus snapshot table), dedup touches ONLY the incremental read's
    rows (`scan_changes` — O(new), never a corpus re-scan):

      exact tier  — hash the new rows, anti-join the STORED hash state
                    (first-come-first-served survivor semantics: a new
                    doc whose content was ever seen is a dup), window-
                    keep-first within the batch, append new survivors;
      near tier   — band the new rows' signatures, join them against
                    the refreshed band table to get candidate pairs
                    with >=1 new member (old x new via stored postings,
                    new x new via self-collision), exact-verify Jaccard.

    Driver row (all counts differential vs DuckDB): batch sizes, the
    FCFS exact-dup count among new docs (text seen in batch 1 OR an
    earlier new doc), the verified near-dup pair count involving a new
    doc (banding finds every j>=0.8 pair on this fixture — the
    certified dedup_minhash_lsh property), and two set-equality
    invariants pinned TRUE: the refreshed hash-key set and band-posting
    set must EQUAL a from-scratch rebuild over the full corpus
    (anti-joins in both directions; any drift in the incremental read,
    the hashing, or the state commits flips them red). Scale: state
    refresh is a keyed append; candidate generation shuffles only
    colliding band postings."""
    corpus_t, hash_t, band_t = _inc_dedup_tables(spark, sf_dir)
    return _inc_dedup_report(spark, sf_dir, corpus_t, hash_t, band_t)


def _inc_dedup_report(
    spark, sf_dir, corpus_t, hash_t, band_t, audits: bool = True
) -> DataFrame:
    """The SERVE/audit path over already-built dedup state: incremental
    read of the new batch, FCFS exact-dup count from state growth,
    band-collision candidate pairs with >=1 new member exact-verified,
    and (audits=True) the two set-equality invariants vs a from-scratch
    rebuild. Factored out of `dedup_incremental_snapshot` so the serve
    bench can time it warm, without the one-time fixture build.

    audits=False is the steady-state WORKLOAD shape: the rebuild audits
    re-shingle the FULL corpus (deliberately — they are the correctness
    harness), while the serve path proper only shingles docs that
    appear in a band-collision candidate pair (a semi-join — O(new +
    colliding) rows, the 100 TB contract)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s1 = corpus_t.first_snapshot_id()
    batch1 = corpus_t.scan(snapshot_id=s1, virtual_column=None)
    new = corpus_t.scan_changes(s1, virtual_column=None)
    h1 = hash_t.first_snapshot_id()
    b1 = band_t.first_snapshot_id()

    n_initial = batch1.agg(F.count("*").cast("long").alias("n_initial_docs"))
    n_new = new.agg(F.count("*").cast("long").alias("n_new_docs"))
    # dups among new docs = new docs that did NOT create a state row
    state_growth = (
        hash_t.scan(virtual_column=None)
        .agg(F.count("*").alias("_n_state"))
        .crossJoin(
            hash_t.scan(snapshot_id=h1, virtual_column=None).agg(
                F.count("*").alias("_n_state1")
            )
        )
    )
    exact_dups = n_new.crossJoin(state_growth).select(
        (
            F.col("n_new_docs") - (F.col("_n_state") - F.col("_n_state1"))
        ).alias("n_exact_dups_new")
    )

    all_bands = band_t.scan(virtual_column=None)
    new_bands = band_t.scan_changes(b1, virtual_column=None)
    cands = (
        new_bands.select("band", "band_hash", F.col("doc_id").alias("doc_n"))
        .join(all_bands, ["band", "band_hash"])
        .filter(F.col("doc_id") != F.col("doc_n"))
        .select(
            F.least("doc_id", "doc_n").alias("doc_a"),
            F.greatest("doc_id", "doc_n").alias("doc_b"),
        )
        .distinct()
    )
    if not audits:
        # workload shape: shingle ONLY candidate-involved docs; the
        # candidate frame feeds both the id semi-join and the verify
        # join, so persist it (one band-join pass, not two)
        cands = persist_tracked(cands)
        cand_ids = (
            cands.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh_cand = shingled(
            d.join(cand_ids, "doc_id", "left_semi"), repartition=False
        )
        near = _verified_pairs(cands, sh_cand, JACCARD_THRESHOLD).agg(
            F.count("*").cast("long").alias("n_near_pairs_new")
        )
        return (
            n_initial.crossJoin(n_new)
            .crossJoin(exact_dups)
            .crossJoin(near)
            .select(
                "n_initial_docs",
                "n_new_docs",
                "n_exact_dups_new",
                "n_near_pairs_new",
            )
        )

    # ONE persisted shingle pass feeds both the pair verification and
    # the full-rebuild band audit below
    sh_full = persist_tracked(shingled(d))
    near = _verified_pairs(cands, sh_full, JACCARD_THRESHOLD).agg(
        F.count("*").cast("long").alias("n_near_pairs_new")
    )

    # set-equality invariants vs a from-scratch rebuild
    def hash_state(df):
        return df.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("doc_id").alias("keep_id")
        )

    state_keys = hash_t.scan(virtual_column=None).select("content_hash")
    full_keys = hash_state(d).select("content_hash")
    # full-outer set audits (round 15): each side evaluates ONCE — the
    # old anti-join union ran the corpus md5 pass and the banding
    # pipeline twice each (see set_equality_match)
    hash_match = set_equality_match(
        full_keys, state_keys, ["content_hash"], "hash_state_matches"
    )
    full_bands = _band_rows_from_shingled(sh_full)
    band_cols = ["band", "band_hash", "doc_id"]
    band_match = set_equality_match(
        full_bands, all_bands.select(band_cols), band_cols,
        "band_state_matches",
    )
    return (
        n_initial.crossJoin(n_new)
        .crossJoin(exact_dups)
        .crossJoin(near)
        .crossJoin(hash_match)
        .crossJoin(band_match)
        .select(
            "n_initial_docs",
            "n_new_docs",
            "n_exact_dups_new",
            "n_near_pairs_new",
            "hash_state_matches",
            "band_state_matches",
        )
    )


@query(
    "dedup_incremental_build_bench",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_corpus_rows,
      CAST(COUNT(DISTINCT text) AS BIGINT) AS n_hash_keys,
      CAST(16 * COUNT(*) AS BIGINT) AS n_band_postings
    FROM documents
    """,
)
def dedup_incremental_build_bench(spark, sf_dir):
    """The dedup-state BUILD as its own bench entry (VERDICT r11 #8,
    the `snapshot_mor_dv_build_bench` pattern): write the three state
    tables FRESH every run — corpus (two appends), exact-hash FCFS
    state, MinHash band postings — so the number isolates state-write +
    commit-protocol cost from the serve path that
    `dedup_incremental_serve_bench` times warm right after. The audit
    row counts each finished table; DuckDB recomputes all three from
    documents alone (corpus = every doc exactly once across the two
    appends; hash keys = distinct content FCFS-collapsed; postings =
    16 bands per doc), pinning that the build wrote exactly the state
    it should. Scale: each build is keyed appends — O(corpus) once,
    never pairwise."""
    corpus_t, hash_t, band_t = _inc_dedup_tables(spark, sf_dir, fresh=True)
    return (
        corpus_t.scan(virtual_column=None)
        .agg(F.count("*").cast("long").alias("n_corpus_rows"))
        .crossJoin(
            hash_t.scan(virtual_column=None).agg(
                F.count("*").cast("long").alias("n_hash_keys")
            )
        )
        .crossJoin(
            band_t.scan(virtual_column=None).agg(
                F.count("*").cast("long").alias("n_band_postings")
            )
        )
    )


@query("dedup_incremental_serve_bench", oracle=_DEDUP_INC_ORACLE)
def dedup_incremental_serve_bench(spark, sf_dir):
    """The dedup-state SERVE path as its own bench entry (VERDICT r11
    #8): identical output contract to `dedup_incremental_snapshot`
    (same oracle), but the state tables come from the session fixture
    cache — in bench order the BUILD entry above has just written
    them — so this number tracks the steady-state incremental path
    alone (scan_changes + candidate join + audits) and a serve-path
    regression can no longer hide under one-time fixture-build
    variance."""
    corpus_t, hash_t, band_t = _inc_dedup_tables(spark, sf_dir)
    return _inc_dedup_report(spark, sf_dir, corpus_t, hash_t, band_t)


def inc_dedup_serve_workload(spark, sf_dir) -> DataFrame:
    """Bench-pinned serve WORKLOAD (the simsearch_ivf contract-vs-
    workload split): the steady-state incremental path alone —
    scan_changes, FCFS exact tier, band-collision candidates,
    verify over candidate-involved docs only — without the full-corpus
    rebuild audits the registered contract additionally runs."""
    corpus_t, hash_t, band_t = _inc_dedup_tables(spark, sf_dir)
    return _inc_dedup_report(
        spark, sf_dir, corpus_t, hash_t, band_t, audits=False
    )
