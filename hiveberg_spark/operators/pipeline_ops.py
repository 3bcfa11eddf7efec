"""Training-data pipeline operators [N] (SURVEY.md §2.11 extensions):
the composition layer a 100 TB corpus pipeline runs between raw scans
and model training — dup-graph resolution, deterministic splits,
sequence packing, frequency ranking. All oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from hiveberg_spark.caching import persist_tracked
from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query
from hiveberg_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SHINGLE_DF_CAP,
    _NGRAM_JACCARD_ORACLE,
    ngram_jaccard_pairs,
    shingled,
)


def label_components(pairs):
    """Connected components over an undirected pair graph by iterative
    min-label propagation to fixpoint: each round every vertex takes
    the min label among itself and its neighbors; rounds = graph
    diameter (dup clusters are shallow; hard cap 20 with a convergence
    assert). Each round is one shuffle join keyed on the vertex id —
    the standard large-graph CC pattern (no driver-side graph state;
    the driver only checks the converged flag). `pairs` must have
    columns (doc_a, doc_b); returns (v, label) with label = the min
    vertex id of v's component."""
    edges = persist_tracked(pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ))
    labels = (
        edges.select(F.col("doc_a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
    )
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.v)
            .groupBy(F.col("doc_a").alias("nv"))
            .agg(F.min("label").alias("nlabel"))
        )
        updated = persist_tracked(
            labels.join(neighbor_min, labels.v == neighbor_min.nv, "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "v")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        if labels.is_cached:  # release the superseded round's cache
            labels.unpersist()
        labels = updated
        if changed == 0:
            break
    else:  # pragma: no cover - diameter > 20 impossible on dup clusters
        raise RuntimeError("connected components did not converge in 20 rounds")
    return labels


@query(
    "dedup_cluster_pick",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_ORACLE}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v
    )
    SELECT v AS doc_id, MIN(r) AS cluster_rep,
           (v = MIN(r)) AS is_kept
    FROM reach GROUP BY v
    """,
)
def dedup_cluster_pick(spark, sf_dir):
    """Connected components over the near-dup pair graph + keep-min
    representative per cluster (the 'cluster pick' step SURVEY §2.11
    names after MinHash candidate generation: near-dup is transitive-ish
    in practice, so survivors must be chosen per CLUSTER, not per pair —
    keeping one doc of every pair independently over-deletes).

    Algorithm: iterative min-label propagation to fixpoint — each round
    every vertex takes the min label among itself and its neighbors;
    rounds = graph diameter (dup clusters are shallow; hard cap 20 with
    a convergence assert). Each round is one shuffle join keyed on the
    vertex id — the standard large-graph CC pattern (no driver-side
    graph state; the driver only checks the converged flag).

    Output: every doc in the pair graph with its cluster representative
    and whether it survives. Oracle: DuckDB recursive transitive
    closure."""
    sh = persist_tracked(shingled(load_table(spark, sf_dir, "documents")))
    pairs = ngram_jaccard_pairs(sh, JACCARD_THRESHOLD, SHINGLE_DF_CAP).select(
        "doc_a", "doc_b"
    )
    labels = label_components(pairs)
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("v") == F.col("label")).alias("is_kept"),
    )


@query(
    "sample_stratified_split",
    oracle="""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n FROM tagged GROUP BY lang, split
    """,
)
def sample_stratified_split(spark, sf_dir):
    """Deterministic stratified train/val/test split (~80/10/10): the
    split key is a pure function of doc_id (two hex chars of md5 →
    uniform over 256 buckets; 'cd'=205→80.1%, 'e7'=231→10.2%/9.7%), so
    membership is stable across runs, machines, and engines — the
    property a training pipeline needs so that re-runs never leak val
    docs into train. Stratification is free: the split is independent
    of lang, so per-lang proportions hold. No shuffle except the final
    tiny count; at 100 TB the tag is a zero-cost projection."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < "cd", "train").when(bucket < "e7", "val").otherwise("test")
    )
    return d.select("lang", split.alias("split")).groupBy("lang", "split").agg(
        F.count("*").alias("n")
    )


@query(
    "token_budget_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    prefix AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS run
      FROM toks
    )
    SELECT CAST(FLOOR((run - n_tokens) / 4096) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM prefix GROUP BY 1
    """,
)
def token_budget_packing(spark, sf_dir):
    """Sequence packing for training batches: assign docs (in doc_id
    order) to 4096-token bins by running token count — each doc lands in
    the bin where its prefix starts (streaming chunking; a straddling
    doc may overflow its bin, the standard LLM-packing tradeoff).

    Scale: the global prefix sum is computed DISTRIBUTED — two-phase
    scan, not a single-partition window: range-repartition by doc_id,
    per-partition prefix sums (parallel windows), then each partition's
    offset from a tiny per-partition total (cumsum over #partitions
    rows, broadcast back). The full-corpus ordering never funnels
    through one task."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    parts = d.repartitionByRange(8, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "local_prefix",
        F.sum("n_tokens").over(
            W.partitionBy("pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    offsets = (
        parts.groupBy("pid")
        .agg(F.sum("n_tokens").alias("ptotal"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("ptotal").over(
                    W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    packed = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        (F.col("local_prefix") + F.col("offset")).alias("run"),
    )
    return (
        packed.select(
            F.floor((F.col("run") - F.col("n_tokens")) / 4096).cast("long").alias("bin"),
            "n_tokens",
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
    )


@query(
    "sample_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5(CONCAT('epoch-7:', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
             AS position
    FROM keyed
    """,
)
def sample_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle — the global training-data permutation
    every epoch needs: reproducible (seeded fingerprint, not rand()),
    different per epoch (the seed string), and resumable (position is a
    pure function of the data, so a restarted job regenerates the same
    order).

    Scale: a naive ROW_NUMBER over the full corpus funnels through one
    task, and even a windowed two-phase rank pays a second full-data
    hash exchange (Window.partitionBy re-shuffles data that the range
    partitioner already placed — visible in .explain). This is the
    distributed zipWithIndex instead: ONE total-order shuffle (the
    information-theoretic floor for a global permutation) + an
    in-partition sort, then `monotonically_increasing_id` — whose value
    is (partition_id << 33) + local_row_index, deterministic after the
    sort — decodes to a local position with zero additional data
    movement; only the 8-row per-partition counts cross the wire for
    the offset cumsum. Positions depend only on the total key order,
    never on the sampled range boundaries."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = d.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit("epoch-7:"), F.col("doc_id").cast("string"))),
    )
    return epoch_shuffle_positions(keyed, n_partitions=8)


def global_positions(
    df: DataFrame,
    order_cols,
    n_partitions: int,
    position_col: str = "position",
) -> DataFrame:
    """Distributed zipWithIndex over an ARBITRARY total order — the
    repo's standard replacement for `ROW_NUMBER() OVER (ORDER BY ...)`,
    which would funnel the full corpus through one task
    (`Exchange SinglePartition`).  ONE range exchange on the order key
    (the information-theoretic floor for a total order) + in-partition
    sort, decode `monotonically_increasing_id` ((partition_id << 33) +
    local index — documented Spark layout), then add broadcast
    per-partition offsets: only the n_partitions-row count frame
    crosses the wire after the range shuffle.  Positions are 1..N
    exactly, independent of `n_partitions` (they depend only on the
    key order) — tests/test_properties.py pins both."""
    parts = persist_tracked(  # consumed twice: rows below, counts here
        df.repartitionByRange(n_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local_pos", F.expr("_mid - (cast(_pid as bigint) << 33)")
        )
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count("*").alias("_pn"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_pn").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return parts.join(F.broadcast(offsets), "_pid").select(
        *df.columns,
        (F.col("_local_pos") + F.col("_offset") + 1)
        .cast("long")
        .alias(position_col),
    )


def epoch_shuffle_positions(keyed: DataFrame, n_partitions: int) -> DataFrame:
    """(shuffle_key, doc_id)-ordered `global_positions`, kept as the
    named entry point the epoch-shuffle family and its invariant tests
    use."""
    return global_positions(
        keyed, [F.asc("shuffle_key"), F.asc("doc_id")], n_partitions
    ).select("doc_id", "shuffle_key", "position")


@query(
    "text_zipf_rank",
    oracle="""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word)
    SELECT word, n, CAST(RANK() OVER (ORDER BY n DESC, word) AS BIGINT) AS zipf_rank
    FROM freq
    ORDER BY zipf_rank LIMIT 50
    """,
)
def text_zipf_rank(spark, sf_dir):
    """Corpus frequency table with Zipf rank — the vocabulary-audit query
    of a data pipeline (token distribution sanity, stop-word discovery
    feeding the stop-shingle cap). Scale: one (word) shuffle with
    map-side combine; top-50 is TakeOrderedAndProject FIRST (per-
    partition heaps, no vocabulary-wide exchange — VERDICT r9 #7), and
    only the 50-row head is ranked. (word) is unique in the frequency
    table so rank over (n DESC, word) never ties — ranking the head
    equals ranking the full vocabulary on rows 1..50."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    head = freq.orderBy(F.desc("n"), F.asc("word")).limit(50)
    return head.withColumn(
        "zipf_rank",
        F.rank().over(W.orderBy(F.desc("n"), F.asc("word"))).cast("long"),
    ).orderBy("zipf_rank")


@query(
    "doc_chunking",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 500
    ),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / 48 AS BIGINT) AS chunk_index,
             w[s:least(s + 63, len(w))] AS chunk
      FROM docs, UNNEST(generate_series(1, len(w), 48)) AS t(s)
    )
    SELECT doc_id, chunk_index,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           chunk[1] AS first_token, chunk[len(chunk)] AS last_token
    FROM chunks
    """,
)
def doc_chunking(spark, sf_dir):
    """Sliding-window document chunking (64-token chunks, stride 48 —
    the chunk-for-embedding step of a retrieval/training pipeline): one
    posexplode of the stride sequence per document, chunk materialized
    with slice(). All JVM higher-order functions; output is
    chunk-per-row, ready for an embedding UDF. Scale: narrow per-row
    expansion, no shuffle at all."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("w"), F.lit(48)),
                lambda s: F.slice(
                    F.col("w"), s, F.least(F.lit(64), F.size("w") - s + 1)
                ),
            )
        ).alias("chunk_index", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_index").cast("long"),
        F.size("chunk").cast("long").alias("n_tokens"),
        F.element_at("chunk", 1).alias("first_token"),
        F.element_at("chunk", F.size("chunk")).alias("last_token"),
    )


@query(
    "text_redact_numbers",
    oracle="""
    SELECT doc_id,
           LENGTH(regexp_replace(text, '[0-9]+', '#', 'g')) AS redacted_len,
           LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]+', '', 'g')) AS n_digit_chars
    FROM documents WHERE doc_id < 1000
    """,
)
def text_redact_numbers(spark, sf_dir):
    """Regex redaction (the PII-scrub shape: pattern → replacement +
    audit count), here masking digit runs in the synthetic corpus. One
    narrow projection, no shuffle; the audit columns make the
    transformation oracle-checkable without comparing full redacted
    text. (Spark regexp_replace is global by default; DuckDB needs the
    'g' flag — a cross-engine quirk worth pinning in a test.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return d.select(
        "doc_id",
        F.length(F.regexp_replace("text", "[0-9]+", "#")).alias("redacted_len"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]+", ""))
        ).alias("n_digit_chars"),
    )


@query(
    "sample_per_stratum_cap",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM ranked WHERE rn <= 100 GROUP BY lang
    """,
)
def sample_per_stratum_cap(spark, sf_dir):
    """Deterministic per-stratum downsample (cap each language at 100
    docs): rank inside each stratum by md5(doc_id) — a stable
    pseudo-random order reproducible across engines and runs (unlike
    rand(), whose stream is engine- and partitioning-specific) — and
    keep the first N. The per-source/per-language cap every corpus
    pipeline applies before training. Scale (round-10 hardening): a
    plain lang-keyed window puts a whole language in ONE task — the
    keyed-skew bottleneck — so the top-100 runs TWO-PHASE: each input
    shard ranks its own (shard, lang) slice in parallel and keeps its
    local top-100 (only those ~100·shards candidate rows per language
    survive), then the final rank runs on that bounded candidate frame.
    The union of per-shard top-100s provably contains the global
    top-100, so the selection is identical to the single-window form."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_shard", F.spark_partition_id()
    )
    key = [F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")]
    local_w = W.partitionBy("_shard", "lang").orderBy(*key)
    cand = (
        d.withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= 100)
        .drop("_lrn", "_shard")
    )
    w = W.partitionBy("lang").orderBy(*key)
    sampled = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 100)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "storage_zorder_locality",
    oracle="""
    WITH base AS (
      SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
    ),
    z AS (
      SELECT x, y,
             list_sum(list_transform(generate_series(0, 7),
               b -> (CAST(FLOOR(x / POWER(2, b)) AS BIGINT) % 2)
                    * CAST(POWER(4, b) AS BIGINT)))
             + 2 * list_sum(list_transform(generate_series(0, 7),
               b -> (CAST(FLOOR(y / POWER(2, b)) AS BIGINT) % 2)
                    * CAST(POWER(4, b) AS BIGINT))) AS zval
      FROM base
    )
    SELECT CAST(FLOOR(zval / 4096) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM z GROUP BY 1
    """,
)
def storage_zorder_locality(spark, sf_dir):
    """Z-order (Morton) clustering — the layout behind Iceberg's
    `rewrite_data_files(strategy=sort, sort_order=zorder(...))`: bit-
    interleave two key columns so range-partitioning the z-value gives
    every file a tight bounding box in BOTH dimensions, and min/max
    file pruning works for predicates on either key. Here: 8-bit coords
    from (l_partkey, l_suppkey), 16 z-buckets (top 4 bits), and the
    per-bucket bounding boxes the oracle verifies — each bucket covers
    a 64×128 quadrant of the 256×256 key space instead of a full-width
    stripe. All integer math, shared exactly with the DuckDB oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )

    def spread(c):  # value with bits of c at even positions (dynamic shifts
        # via exact double pow — all values < 2^53)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(7)),
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.pmod((c / F.pow(F.lit(2.0), b)).cast("long"), F.lit(2))
            * F.pow(F.lit(4.0), b).cast("long"),
        )

    z = li.withColumn("zval", spread(F.col("x")) + 2 * spread(F.col("y")))
    return (
        z.select(F.floor(F.col("zval") / 4096).cast("long").alias("bucket"), "x", "y")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


# -- benchmark decontamination --------------------------------------------

DECON_EVAL_SOURCE = "src19"  # stand-in eval/benchmark corpus
DECON_NGRAM = 5  # words per contamination n-gram


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id, source, array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ') AS g
      FROM words, UNNEST(range(1, GREATEST(len(w) - {DECON_NGRAM - 2}, 1))) AS t(i)
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE source = '{DECON_EVAL_SOURCE}'
    ), hit AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE source <> '{DECON_EVAL_SOURCE}' AND g IN (SELECT g FROM eval_grams)
    )
    SELECT d.doc_id, d.source, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hit h USING (doc_id)
    WHERE d.source <> '{DECON_EVAL_SOURCE}'
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination — the train/eval overlap scrub every
    LLM corpus pipeline runs before training: a training doc is
    contaminated if it shares any {DECON_NGRAM}-word n-gram with the
    eval corpus (here the `{DECON_EVAL_SOURCE}` slice of `documents`
    stands in for the benchmark suite).

    Scale shape: n-grams are built per row with JVM higher-order
    functions (no Python, no pre-explode shuffle); the train side
    explodes to (doc_id, gram) and LEFT SEMI joins the distinct eval
    grams — in production the eval side is a fixed-size benchmark suite
    (MBs) so AQE turns this into a broadcast join for free; no forced
    hint because in THIS fixture the eval slice scales with SF (the
    exact trap VERDICT r1 #3 flagged). The final doc-level flag is a
    left join on doc_id of the (small) contaminated-id set."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = DECON_NGRAM
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    with_grams = docs.select("doc_id", "source", grams.alias("grams"))
    eval_grams = (
        with_grams.filter(F.col("source") == DECON_EVAL_SOURCE)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    train = with_grams.filter(F.col("source") != DECON_EVAL_SOURCE)
    hit = (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(eval_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return train.join(hit, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("hit", F.lit(False)).alias("contaminated"),
    )


# -- intra-document repetition filter -------------------------------------


@query(
    "text_repetition_filter",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             [array_to_string(w[i:i+1], ' ')
              FOR i IN range(1, GREATEST(len(w), 1))] AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
    SELECT doc_id,
           len(g) AS total_bigrams,
           len(list_distinct(g)) AS distinct_bigrams,
           CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE), 6)
           END AS dup_fraction,
           (CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE 1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE)
            END > 0.5) AS is_repetitive
    FROM grams
    """,
)
def text_repetition_filter(spark, sf_dir):
    """Duplicate-bigram repetition filter (the Gopher/MassiveText
    within-document quality rule): the fraction of a doc's word bigrams
    that are repeats of an earlier bigram; docs above the threshold are
    flagged as machine-generated/boilerplate suspects.

    Scale shape: entirely per-row JVM higher-order functions (split →
    transform over sequence → array_distinct) — zero shuffles, zero
    Python, pipelines inside one WholeStageCodegen span with the scan;
    the ideal 100 TB operator. Threshold compare happens on the raw
    double (identical IEEE math in both engines); ROUND(...,6) only for
    the hash-stable output column."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.array_join(F.slice(w, i, 2), " "),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    g = docs.select("doc_id", bigrams.alias("g"))
    total = F.size("g")
    distinct = F.size(F.array_distinct("g"))
    raw = F.when(total == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - distinct / total.cast("double")
    )
    return g.select(
        "doc_id",
        total.alias("total_bigrams"),
        distinct.alias("distinct_bigrams"),
        F.round(raw, 6).alias("dup_fraction"),
        (raw > 0.5).alias("is_repetitive"),
    )


# -- temperature-based mixture sampling -----------------------------------

MIX_ALPHA = 0.3  # temperature exponent (multilingual-LM standard)
MIX_BUDGET = 0.5  # sample half the corpus


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), z AS (
      SELECT SUM(POW(CAST(n AS DOUBLE), {MIX_ALPHA})) AS z, SUM(n) AS total FROM c
    ), qt AS (
      SELECT source,
             CAST(FLOOR({MIX_BUDGET} * total *
                        ROUND(POW(CAST(n AS DOUBLE), {MIX_ALPHA}) / z, 12))
                  AS BIGINT) AS quota
      FROM c, z
    ), rk AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT rk.doc_id, rk.source, (rk.rk <= qt.quota) AS kept
    FROM rk JOIN qt USING (source)
    """,
)
def sample_temperature_mixture(spark, sf_dir):
    """Temperature-based mixture sampling (the XLM-R/mC4 curriculum op):
    per-source sampling quotas follow p_s ∝ n_s^α (α=0.3) so
    low-resource sources are up-weighted relative to their raw share,
    then a deterministic md5-ordered rank keeps exactly quota docs per
    source out of a total budget of half the corpus.

    Cross-engine determinism: p_s is ROUND(...,12)ed before the quota
    floor so a ULP difference in the two engines' Σ n^α summation order
    can never flip FLOOR at an integer boundary. Scale shape: quotas
    come from a 20-row aggregate joined back (AQE broadcasts it); the
    exact-quota rank is one shuffle partitioned by source — the oracle
    baseline. At 100 TB the production variant replaces rank with a
    hash-threshold (kept = hash(doc_id) < quota/n) which is shuffle-free
    and hits quota ±O(√n); exactness is what makes this one checkable."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    z = counts.agg(
        F.sum(F.pow(F.col("n").cast("double"), F.lit(MIX_ALPHA))).alias("z"),
        F.sum("n").alias("total"),
    )
    quotas = (
        counts.crossJoin(z)
        .withColumn(
            "p",
            F.round(F.pow(F.col("n").cast("double"), F.lit(MIX_ALPHA)) / F.col("z"), 12),
        )
        .select(
            "source",
            F.floor(F.lit(MIX_BUDGET) * F.col("total") * F.col("p"))
            .cast("long")
            .alias("quota"),
        )
    )
    # per-source rank WITHOUT a source-keyed window (round-10 hardening:
    # a handful of sources over a 100 TB corpus = a handful of
    # corpus-sized window tasks): one GLOBAL two-phase rank over
    # (source, md5, doc_id) via global_positions, minus broadcast
    # per-source offsets — the sample_perplexity_split pattern. Unlike
    # the per-stratum cap, the quota here is a corpus-scale FRACTION,
    # so a local-top-k candidate pass cannot bound the work; the global
    # rank is the right primitive.
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("_mk"),
    )
    pos = global_positions(
        keyed, [F.asc("source"), F.asc("_mk"), F.asc("doc_id")], 8
    )
    src_sizes = (
        keyed.groupBy("source")
        .agg(F.count("*").alias("_sn"))
        .withColumn(
            "_soffset",
            F.coalesce(
                F.sum("_sn").over(
                    W.orderBy("source").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("source", "_soffset")
    )
    ranked = pos.join(F.broadcast(src_sizes), "source").select(
        "doc_id",
        "source",
        (F.col("position") - F.col("_soffset")).alias("rk"),
    )
    return ranked.join(quotas, "source").select(
        "doc_id", "source", (F.col("rk") <= F.col("quota")).alias("kept")
    )


@query(
    "pipeline_corpus_build",
    oracle="""
    WITH eval_texts AS (
      SELECT DISTINCT text FROM documents WHERE doc_id % 7 = 3
    ),
    decon AS (
      SELECT d.* FROM documents d
      WHERE d.doc_id % 7 <> 3
        AND d.text NOT IN (SELECT text FROM eval_texts)
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM decon
      ) WHERE rn = 1
    ),
    quality AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens
      FROM deduped
      WHERE len(string_split(text, ' ')) >= 20
    ),
    tagged AS (
      SELECT *,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
                  ELSE 'test' END AS split
      FROM quality
    ),
    capped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY split, lang
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crn
        FROM tagged
      ) WHERE crn <= 50
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM capped GROUP BY split, lang
    """,
)
def pipeline_corpus_build(spark, sf_dir):
    """END-TO-END corpus construction — the whole training-data
    pipeline as ONE declarative DAG, the way a production run composes
    the individual operators this repo ships: benchmark
    decontamination (drop the eval slice and any training doc whose
    text exactly matches an eval doc — semi-join against the tiny eval
    text set), exact dedup (keep-first per content hash), a quality
    gate (>= 20 whitespace tokens), the deterministic md5 train/val/
    test split, a per-(split, lang) cap of 50 by stable pseudo-random
    rank, and final per-cell doc/token accounting. Catalyst plans the
    whole thing as one job — no intermediate materialization; at
    100 TB the only wide ops are the content-hash dedup shuffle and
    the (split, lang) cap window, both keyed exactly as their
    standalone operators. One oracle pins every stage at once: any
    stage drifting from its SQL twin flips the final counts."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % 7) == 3
    eval_texts = d.filter(is_eval).select("text").distinct()
    decon = d.filter(~is_eval).join(eval_texts, "text", "left_anti")
    w_dedup = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        decon.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    toks = F.size(F.split("text", " "))
    quality = deduped.withColumn("n_tokens", toks).filter(
        F.col("n_tokens") >= 20
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = quality.withColumn(
        "split",
        F.when(bucket < "cd", "train").when(bucket < "e7", "val").otherwise(
            "test"
        ),
    )
    w_cap = W.partitionBy("split", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    capped = tagged.withColumn("crn", F.row_number().over(w_cap)).filter(
        F.col("crn") <= 50
    )
    return capped.groupBy("split", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


#: DSIR selection budget as a fraction of the raw corpus
DSIR_KEEP_FRAC = 0.25


@query(
    "sample_dsir_weights",
    oracle=f"""
    WITH wf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), occ AS (
      SELECT doc_id, w FROM wf WHERE w <> ''
    ), raw AS (
      SELECT w, COUNT(*) AS rc FROM occ GROUP BY w
    ), tgt AS (
      SELECT o.w, COUNT(*) AS tc
      FROM occ o JOIN documents d USING (doc_id)
      WHERE d.lang = 'en' GROUP BY o.w
    ), tot AS (
      SELECT (SELECT SUM(rc) FROM raw) AS r_total,
             (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS t_total,
             (SELECT COUNT(*) FROM raw) AS v
    ), lr AS (
      SELECT raw.w,
             CAST(ROUND(LN((COALESCE(tgt.tc, 0) + 1.0) / (tot.t_total + tot.v))
                        - LN((raw.rc + 1.0) / (tot.r_total + tot.v)), 6)
                  AS DECIMAL(18,6)) AS lr
      FROM raw LEFT JOIN tgt USING (w), tot
    ), scored AS (
      SELECT o.doc_id,
             ROUND(CAST(SUM(lr.lr) AS DOUBLE) / COUNT(*), 6) AS dsir_score
      FROM occ o JOIN lr ON o.w = lr.w
      GROUP BY o.doc_id
    )
    SELECT doc_id, dsir_score,
           (ROW_NUMBER() OVER (ORDER BY dsir_score DESC, doc_id)
              <= FLOOR({DSIR_KEEP_FRAC} * COUNT(*) OVER ())) AS selected
    FROM scored
    """,
)
def sample_dsir_weights(spark, sf_dir):
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by the log importance
    ratio of a TARGET language model over a RAW one — here add-one-
    smoothed unigram bag-of-words models, target = the lang='en' slice —
    and keep the top 25%. This is THE shape for steering a 100 TB crawl
    toward a curated target domain without training a classifier.

    Cross-engine determinism: per-word log-ratios are ROUND(...,6)ed
    into DECIMAL(18,6) so each document's score is an exact decimal sum
    (order-independent) divided once at the end; ties in the final rank
    break on doc_id.

    Scale shape: two word-count aggregates (one shuffle each on the
    word key — the target one over a filtered subset), a ~vocab-sized
    log-ratio frame the occurrence join broadcasts via AQE, and one
    doc_id aggregate. The top-25% cut is a TWO-PHASE threshold, never a
    full-corpus single-task window: `global_positions` range-ranks only
    the (score, doc_id) pairs, the k-th pair becomes a one-row
    broadcast threshold, and selection is a stateless predicate —
    plan-pinned single-partition-free by tests/test_round10_plans.py. The paper's production
    variant hashes n-grams into 2^k buckets (xxhash64 % 2^k here)
    purely to bound the vocabulary — identical plan shape, smaller
    build side; the unhashed unigram twin is what makes this
    exact-oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    # Round 14 (guide §2.3/§2.4): the raw and target word counts used to
    # be TWO explode passes + two word-key shuffles (the target one
    # behind a corpus-sized doc_id join to the lang='en' id list). But
    # `lang` is a column of documents — carried through the explode, ONE
    # pass and ONE word-key exchange computes both counts as conditional
    # aggregates, and the en-id join disappears entirely. Values are
    # unchanged: tc was NULL-coalesced to 0 for words absent from the en
    # slice, exactly what the conditional count returns; t_total sums
    # the same tc over the same words (zeros add nothing).
    occ = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("_en"),
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    wc = occ.groupBy("w").agg(
        F.count("*").alias("rc"),
        F.count(F.when(F.col("_en"), 1)).alias("tc"),
    )
    tot = wc.agg(
        F.sum("rc").alias("r_total"),
        F.count("*").alias("v"),
        F.sum("tc").alias("t_total"),
    )
    lr = (
        wc.crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.round(
                F.log(
                    (F.col("tc") + F.lit(1.0))
                    / (F.col("t_total") + F.col("v"))
                )
                - F.log(
                    (F.col("rc") + F.lit(1.0)) / (F.col("r_total") + F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    scored = persist_tracked(
        occ.join(lr, "w")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum("lr").cast("double") / F.count("*"), 6
            ).alias("dsir_score")
        )
    )
    # top-25% selection WITHOUT a full-corpus single-task window
    # (VERDICT r9 #2): two-phase rank the (score, doc_id) pairs
    # (`global_positions` — one range exchange + broadcast offsets),
    # pick the k-th pair as the keep threshold (one-row aggregate;
    # all-NULL when k = 0, coalescing to nobody selected), and apply
    # selection as a stateless broadcast predicate on the scored frame.
    # Ties at the boundary break on doc_id exactly like the oracle's
    # ROW_NUMBER(ORDER BY dsir_score DESC, doc_id).
    pos = global_positions(
        scored, [F.desc("dsir_score"), F.asc("doc_id")], 8
    )
    n = scored.agg(F.count("*").alias("n_total"))
    thr = (
        pos.crossJoin(F.broadcast(n))
        .filter(
            F.col("position")
            == F.floor(F.lit(DSIR_KEEP_FRAC) * F.col("n_total"))
        )
        .agg(
            F.max("dsir_score").alias("thr_score"),
            F.max("doc_id").alias("thr_doc"),
        )
    )
    selected = F.coalesce(
        (F.col("dsir_score") > F.col("thr_score"))
        | (
            (F.col("dsir_score") == F.col("thr_score"))
            & (F.col("doc_id") <= F.col("thr_doc"))
        ),
        F.lit(False),
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "dsir_score", selected.alias("selected")
    )


#: weighted-sample size (fixed: valid at every SF's corpus size)
ARES_K = 100


@query(
    "sample_weighted_ares",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             ROUND(-LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) + 1) / 4294967296.0)
                   / n_chars, 9) AS race_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, race_key FROM keyed
    ORDER BY race_key, doc_id LIMIT {ARES_K}
    """,
)
def sample_weighted_ares(spark, sf_dir):
    """Weighted sampling without replacement via A-Res reservoir keys
    (Efraimidis & Spirakis 2006): each document races with an
    exponential clock -ln(u)/w — u a deterministic md5-derived uniform,
    w = n_chars — and the K smallest keys win, giving inclusion
    probability proportional to weight without ever materializing
    cumulative distributions. THE primitive for size-weighted corpus
    subsampling at 100 TB: one scan, and the top-K runs as Spark's
    TakeOrderedAndProject (map-side partial top-K per partition, K rows
    to the driver-side merge — no global sort, no single-partition
    window).

    Cross-engine determinism: u is the same 32-bit md5 prefix in both
    engines (+1 to dodge ln(0)), keys ROUND(...,9)ed before ranking,
    ties broken on doc_id."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        F.round(-F.log(u) / F.col("n_chars"), 9).alias("race_key"),
    )
    return keyed.orderBy(F.asc("race_key"), F.asc("doc_id")).limit(ARES_K)


@query(
    "pipeline_incremental_dedup",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash FROM (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (
               PARTITION BY md5(text)
               ORDER BY (doc_id % 3), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def pipeline_incremental_dedup(spark, sf_dir):
    """INCREMENTAL INGESTION DEDUP — the pattern a continuously-fed
    training corpus actually runs: documents arrive in commits on a
    snapshot table; each batch is read via the INCREMENTAL READ
    (scan_changes — only the new files, never a rescan), deduped
    within itself (keep-first), then anti-joined against the accepted
    LEDGER's content hashes before appending to it. Per-batch cost is
    O(batch + hash-probe of the ledger) — at 100 TB the ledger probe is
    a broadcast/hash anti-join on the md5 key, and no batch ever
    re-reads history. The final ledger must equal the global keep-first
    dedup over everything ingested, in arrival order — which the
    oracle replays as ORDER BY (batch, doc_id) inside the hash
    partition."""
    import os

    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources.snapshot_table import SnapshotTable, build_once

    loc = os.path.join(warehouse_dir(sf_dir), "docs_incr_dedup")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def builder(ledger):
        src = SnapshotTable.create(
            spark, os.path.join(ledger.location, "src_tbl")
        )
        cursor = None
        for i in range(3):  # three arrival batches
            sid = src.append(docs.filter(F.col("doc_id") % 3 == i))
            batch = (
                src.scan_changes(cursor, sid, virtual_column=None)
                if cursor is not None
                else src.scan(snapshot_id=sid, virtual_column=None)
            )
            w = W.partitionBy(F.md5("text")).orderBy("doc_id")
            cand = (
                batch.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("doc_id", F.md5("text").alias("content_hash"))
            )
            if cursor is not None:
                cand = cand.join(
                    ledger.scan(virtual_column=None).select("content_hash"),
                    "content_hash",
                    "left_anti",
                )
            ledger.append(cand.select("doc_id", "content_hash"))
            cursor = sid

    with _lock:
        t = build_once(spark, loc, builder)
    return t.scan(virtual_column=None).select("doc_id", "content_hash")


# -- single-pass pipeline observability (Observation API) ---------------------


@query(
    "pipeline_observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST((SELECT COUNT(*) FROM documents WHERE n_chars >= 150)
                AS BIGINT) AS n_kept,
           CAST((SELECT SUM(n_chars) FROM documents WHERE n_chars >= 150)
                AS BIGINT) AS kept_chars
    FROM documents
    """,
)
def pipeline_observed_metrics(spark, sf_dir):
    """Single-pass pipeline OBSERVABILITY via `DataFrame.observe` — the
    data-quality counters a production corpus job must emit WITHOUT a
    second scan (at 100 TB, "run the pipeline, then re-aggregate the
    input for the dashboard" doubles the IO bill; `observe` piggybacks
    accumulator-style aggregates on the very pass that writes the
    output). Two Observations bracket a length gate (keep n_chars >=
    150): one on the raw scan (volume + length profile), one after the
    filter (kept counts) — i.e. per-stage funnel metrics from ONE
    action. The action is a real sink write (temp parquet, immediately
    discarded); the returned row is the observed metrics, which the
    oracle recomputes from the source table directly — pinning that
    observe-collected metrics equal first-class aggregation."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import Observation

    d = load_table(spark, sf_dir, "documents")
    ingest = Observation("ingest")
    kept = Observation("kept")
    gated = d.observe(
        ingest,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars") < 150, 1).otherwise(0)).alias(
            "n_short"
        ),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    ).filter(F.col("n_chars") >= 150).observe(
        kept,
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    out_dir = tempfile.mkdtemp(prefix=f"hbs_obs_{uuid.uuid4().hex[:8]}_")
    try:
        gated.write.mode("overwrite").parquet(out_dir)  # the ONE action
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    m = {**ingest.get, **kept.get}
    return spark.createDataFrame(
        [tuple(int(m[k]) for k in (
            "n_docs", "n_short", "total_chars", "min_chars", "max_chars",
            "n_kept", "kept_chars",
        ))],
        "n_docs long, n_short long, total_chars long, min_chars long, "
        "max_chars long, n_kept long, kept_chars long",
    )


# -- k-center greedy coreset (farthest-point diversity sampling) --------------

_KCENTER_K = 8


def _kcenter_oracle(k: int) -> str:
    """Programmatically unrolled DuckDB oracle: the greedy farthest-
    point recurrence as k materialized CTE steps (argmax of min
    cosine-distance to the chosen set, vec_id tiebreak)."""
    s = """
    WITH flat AS MATERIALIZED (
      SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    norms AS MATERIALIZED (
      SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM flat GROUP BY vec_id
    ),
    dist AS MATERIALIZED (
      SELECT a.vec_id AS x, b.vec_id AS y,
             ROUND(1 - SUM(a.v * b.v) / (MIN(n1.nrm) * MIN(n2.nrm)), 6) AS d
      FROM flat a JOIN flat b ON a.pos = b.pos AND a.vec_id != b.vec_id
      JOIN norms n1 ON n1.vec_id = a.vec_id
      JOIN norms n2 ON n2.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    ch1 AS MATERIALIZED (SELECT MIN(vec_id) AS vec_id, 1 AS pick FROM embeddings)"""
    for i in range(2, k + 1):
        s += f""",
    s{i} AS MATERIALIZED (
      SELECT d.x AS vec_id, {i} AS pick FROM dist d
      JOIN ch{i - 1} c ON d.y = c.vec_id
      WHERE d.x NOT IN (SELECT vec_id FROM ch{i - 1})
      GROUP BY d.x
      ORDER BY MIN(d.d) DESC, d.x
      LIMIT 1
    ),
    ch{i} AS MATERIALIZED (
      SELECT * FROM ch{i - 1} UNION ALL SELECT * FROM s{i}
    )"""
    return s + f"""
    SELECT CAST(pick AS BIGINT) AS pick, vec_id FROM ch{k}"""


@query("sample_kcenter_coreset", oracle=_kcenter_oracle(_KCENTER_K))
def sample_kcenter_coreset(spark, sf_dir):
    """K-CENTER GREEDY coreset (farthest-point diversity sampling — the
    2-approximation of the k-center objective; Sener & Savarese 2018's
    active-learning coreset): start from the lowest vec_id, then k-1
    times pick the vector MAXIMIZING its minimum cosine-distance to the
    already-chosen set. The complement of dedup: dedup removes what's
    too close, a coreset KEEPS a maximally-spread representative subset
    (eval-set construction, label-budget allocation, prototype picks).

    Gonzalez's algorithm needs distances only from each point to the
    CHOSEN set, never point-to-point: the loop carries one running
    `mind` column (min distance to any chosen center so far) and each
    step is (a) a distributed argmax over `mind` and (b) one `least()`
    update against the single new center, delivered as a broadcast
    1-row frame. Total work is O(n·k) — the all-pairs O(n²) distance
    frame the r6 version persisted is gone (VERDICT r6 #2); the oracle
    keeps the quadratic formulation because DuckDB has no loop state,
    and the trajectories agree exactly. Distances round to 6 dp before
    both the argmax and the running-min with a vec_id tiebreak, so the
    greedy trajectory is deterministic cross-engine. Each step's frame
    is persisted and the previous unpersisted, so the k argmax jobs
    never recompute the accumulated lineage."""
    from hiveberg_spark.operators.simsearch import _dot, with_norm

    emb = with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    first = emb.orderBy("vec_id").limit(1).head()
    chosen = [(1, first["vec_id"])]

    def center_frame(row):
        return F.broadcast(
            emb.sparkSession.createDataFrame(
                [(row["embedding"], float(row["_norm"]))],
                "cv array<double>, cn double",
            )
        )

    d_new = F.round(
        F.lit(1.0)
        - _dot(F.col("embedding"), F.col("cv")) / (F.col("_norm") * F.col("cn")),
        6,
    )
    cur = (
        emb.crossJoin(center_frame(first))
        .filter(F.col("vec_id") != F.lit(first["vec_id"]))
        .select("vec_id", "embedding", "_norm", d_new.alias("mind"))
        .persist()
    )
    for pick in range(2, _KCENTER_K + 1):
        nxt = cur.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).head()
        chosen.append((pick, nxt["vec_id"]))
        if pick == _KCENTER_K:
            break
        prev = cur
        cur = (
            cur.crossJoin(center_frame(nxt))
            .filter(F.col("vec_id") != F.lit(nxt["vec_id"]))
            .select(
                "vec_id",
                "embedding",
                "_norm",
                F.least(F.col("mind"), d_new).alias("mind"),
            )
            .persist()
        )
        cur.count()
        prev.unpersist()
    cur.unpersist()
    return spark.createDataFrame(chosen, "pick long, vec_id long")


@query(
    "pipeline_data_card",
    oracle="""
    SELECT COALESCE(source, '<all>') AS source,
           COALESCE(lang, '<all>') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dup_docs,
           ROUND(SUM(len(string_split(text, ' '))) * 1.0 / COUNT(*), 6)
             AS avg_tokens
    FROM documents
    GROUP BY GROUPING SETS ((source, lang), (source), ())
    """,
)
def pipeline_data_card(spark, sf_dir):
    """CORPUS DATA CARD in one pass — the "datasheet for datasets"
    summary every training-data release ships (per-source, per-
    (source, lang), and corpus-total doc/token/char counts, exact-
    duplicate rates, average lengths) computed via GROUPING SETS so
    the corpus is scanned ONCE and Catalyst expands the grouping
    combinations map-side. The dup rate per group is docs minus
    distinct content hashes — the same md5 the exact-dedup operator
    keys on, so the card agrees with what `dedup_exact` would remove.
    At 100 TB this is the audit artifact a curation run emits beside
    its output table (and `pipeline_observed_metrics` collects the
    streaming-side equivalents on the write pass itself)."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT COALESCE(source, '<all>') AS source,
               COALESCE(lang, '<all>') AS lang,
               COUNT(*) AS n_docs,
               SUM(size(split(text, ' '))) AS total_tokens,
               SUM(n_chars) AS total_chars,
               COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dup_docs,
               ROUND(CAST(SUM(size(split(text, ' '))) AS DOUBLE) / COUNT(*), 6)
                 AS avg_tokens
        FROM documents
        GROUP BY GROUPING SETS ((source, lang), (source), ())
        """
    )


# -- per-source contamination report (round 9) ---------------------------------


@query(
    "pipeline_contamination_report",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id, source, array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ') AS g
      FROM words, UNNEST(range(1, GREATEST(len(w) - {DECON_NGRAM - 2}, 1))) AS t(i)
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE source = '{DECON_EVAL_SOURCE}'
    ), hit AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE source <> '{DECON_EVAL_SOURCE}' AND g IN (SELECT g FROM eval_grams)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(h.doc_id) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COUNT(h.doc_id) AS DOUBLE) / COUNT(*), 6)
             AS contamination_rate,
           CAST(SUM(CASE WHEN h.doc_id IS NULL
                    THEN len(string_split(d.text, ' ')) ELSE 0 END)
                AS BIGINT) AS clean_tokens
    FROM documents d LEFT JOIN hit h USING (doc_id)
    WHERE d.source <> '{DECON_EVAL_SOURCE}'
    GROUP BY d.source
    """,
)
def pipeline_contamination_report(spark, sf_dir):
    """PER-SOURCE CONTAMINATION REPORT — the release-gate artifact a
    decontamination run emits (VERDICT r8 #8): for every training
    source, how many documents share a {DECON_NGRAM}-gram with the eval
    corpus (`{DECON_EVAL_SOURCE}` stands in for the benchmark suite),
    the contamination rate, and the token budget that survives the
    scrub. Composes the SAME gram/semi-join machinery as
    `decontaminate_ngram_overlap` (per-row JVM gram arrays, explode to
    (doc_id, gram), LEFT SEMI against the distinct eval grams —
    broadcast-sized in production) and adds only one low-cardinality
    per-source rollup on top, so the report costs one extra map-side-
    combinable aggregate over the flag frame a scrub already produces.
    Counts integer-exact; the rate is one IEEE division, 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = DECON_NGRAM
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    # persisted: the eval-gram and train sides both consume this frame
    # (one corpus scan + gram build instead of two)
    with_grams = persist_tracked(docs.select(
        "doc_id", "source", F.size(w).alias("n_tokens"), grams.alias("grams")
    ))
    eval_grams = (
        with_grams.filter(F.col("source") == DECON_EVAL_SOURCE)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    train = with_grams.filter(F.col("source") != DECON_EVAL_SOURCE)
    hit = (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(eval_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    flagged = train.join(hit, "doc_id", "left")
    contaminated = F.col("hit").isNotNull()
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(contaminated.cast("long")).alias("n_contaminated"),
        F.round(
            F.sum(contaminated.cast("long")).cast("double") / F.count("*"), 6
        ).alias("contamination_rate"),
        F.sum(
            F.when(contaminated, F.lit(0)).otherwise(F.col("n_tokens"))
        ).alias("clean_tokens"),
    )


# -- dedup cascade attrition report (round 9) -----------------------------------


@query(
    "pipeline_dedup_cascade_report",
    oracle=f"""
    WITH survivors1 AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    docs AS (SELECT doc_id, regexp_split_to_array(text,' ') AS w FROM survivors1),
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
    ),
    neardup AS (
      SELECT DISTINCT doc_b AS doc_id FROM inter
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
      WHERE i / (len(sa.shingles) + len(sb.shingles) - i)
            >= {JACCARD_THRESHOLD}
    ),
    n AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n0,
             (SELECT COUNT(*) FROM survivors1) AS n1,
             (SELECT COUNT(*) FROM neardup) AS nd
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'exact' AS name,
             CAST(n0 AS BIGINT) AS docs_in,
             CAST(n0 - n1 AS BIGINT) AS docs_removed,
             CAST(n1 AS BIGINT) AS docs_out,
             ROUND(CAST(n0 - n1 AS DOUBLE) / n0, 6) AS removal_rate
      FROM n
      UNION ALL
      SELECT 2, 'neardup_jaccard',
             CAST(n1 AS BIGINT), CAST(nd AS BIGINT),
             CAST(n1 - nd AS BIGINT),
             ROUND(CAST(nd AS DOUBLE) / n1, 6)
      FROM n
    )
    """,
)
def pipeline_dedup_cascade_report(spark, sf_dir):
    """DEDUP CASCADE ATTRITION REPORT — the per-stage funnel every
    curation run logs (how many documents each dedup stage removed, in
    pipeline order): stage 1 exact content-hash keep-first, stage 2
    near-dup removal of every doc that is the HIGHER id of an exact-
    Jaccard >= {JACCARD_THRESHOLD} pair among stage-1 survivors
    (keep-lowest, pair-based — the deterministic, SQL-expressible
    policy; the transitive-closure variant is `dedup_cluster_pick`).
    Composes the registered stages' own machinery: the `dedup_exact_
    survivors` window and the DF-capped `ngram_jaccard_pairs` index, so
    the report IS the pipeline, not a re-implementation. Output is two
    fixed rows — the driver artifact a 100 TB run ships to its
    dashboard; every count is one distributed aggregate, nothing
    driver-side."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()
    rn = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    # persisted: consumed twice (the stage-1 count and the stage-2
    # shingling) — without the cache each consumer re-runs the window
    # over a fresh corpus scan
    survivors1 = (
        docs.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
    ).persist()
    n1 = survivors1.count()
    sh = persist_tracked(shingled(survivors1))
    pairs = ngram_jaccard_pairs(sh, JACCARD_THRESHOLD, SHINGLE_DF_CAP)
    nd = pairs.select("doc_b").distinct().count()
    # every consumer of the cached frames is a driver-side count above —
    # release them here so back-to-back report runs don't accumulate
    # storage memory (VERDICT r9 hygiene #3)
    sh.unpersist()
    survivors1.unpersist()
    # empty-corpus guard (ADVICE r9 #4): removal rate is 0.0 when the
    # stage saw no input, never a ZeroDivisionError
    r1 = round((n0 - n1) / n0, 6) if n0 else 0.0
    r2 = round(nd / n1, 6) if n1 else 0.0
    rows = [
        (1, "exact", n0, n0 - n1, n1, r1),
        (2, "neardup_jaccard", n1, nd, n1 - nd, r2),
    ]
    return spark.createDataFrame(
        rows,
        "stage int, name string, docs_in long, docs_removed long, "
        "docs_out long, removal_rate double",
    )


# -- token-budget water-filling across sources (round 9) -------------------------


@query(
    "pipeline_budget_waterfill",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(t) AS BIGINT) AS total,
             CAST(SUM(t) // 2 AS BIGINT) AS b
      FROM src
    ),
    ordered AS (
      SELECT source, t,
             ROW_NUMBER() OVER (ORDER BY t, source) AS rn,
             SUM(t) OVER (ORDER BY t, source
                          ROWS UNBOUNDED PRECEDING) AS prefix
      FROM src
    ),
    lvl AS (
      SELECT COALESCE(MAX(CASE WHEN prefix + t * (k - rn) <= b
                           THEN rn END), 0) AS mstar,
             COALESCE(MAX(CASE WHEN prefix + t * (k - rn) <= b
                           THEN prefix END), 0) AS pstar,
             MAX(k) AS k, MAX(b) AS b
      FROM ordered, tot
    ),
    c AS (
      SELECT CASE WHEN k > mstar
                  THEN CAST(b - pstar AS DOUBLE) / (k - mstar)
                  ELSE CAST(b AS DOUBLE) END AS level
      FROM lvl
    )
    SELECT o.source, o.t AS tokens,
           ROUND(LEAST(CAST(o.t AS DOUBLE), c.level), 6) AS allocation,
           (CAST(o.t AS DOUBLE) > c.level) AS capped
    FROM ordered o, c
    """,
)
def pipeline_budget_waterfill(spark, sf_dir):
    """TOKEN-BUDGET WATER-FILLING across sources — the mixture-design
    allocator behind "cap the big crawls, keep the small curated sets
    whole": given a training budget B (here half the corpus), every
    source gets min(tokens, c) where the water level c is chosen so the
    allocations sum exactly to B. The classic O(k log k) closed form:
    sort sources by size, find the largest prefix m* that fits fully
    funded (prefix_m + t_m·(k−m) ≤ B — the fit test is monotone in m,
    so m* is well-defined), then c = (B − prefix_{m*})/(k − m*).
    Shape: the corpus-wide scan is ONE map-side-combinable
    groupBy(source); everything after runs on the k-row source table
    (k ≈ 20 here, ≤ thousands in production — the global sort window is
    over that TINY frame, never the corpus). Determinism: counts and
    prefixes are exact integers, c is one IEEE division both engines
    compute from identical integers, and allocations are rounded to
    6 dp after a least() against c."""
    docs = load_table(spark, sf_dir, "documents")
    # persist the k-row aggregate: three consumers (totals, ranking,
    # final projection) would otherwise each re-derive it from the
    # corpus scan — 3 scans at 100 TB instead of 1 (caught by the
    # round-9 plan audit)
    src = persist_tracked(docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ))
    tot = src.agg(
        F.count("*").alias("k"),
        F.sum("t").alias("total"),
        (F.sum("t") / 2).cast("long").alias("b"),
    )
    wo = W.orderBy("t", "source")
    ordered = src.select(
        "source",
        "t",
        F.row_number().over(wo).alias("rn"),
        F.sum("t").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("prefix"),
    )
    fit = F.col("prefix") + F.col("t") * (F.col("k") - F.col("rn")) <= F.col("b")
    lvl = ordered.crossJoin(F.broadcast(tot)).agg(
        F.coalesce(F.max(F.when(fit, F.col("rn"))), F.lit(0)).alias("mstar"),
        F.coalesce(F.max(F.when(fit, F.col("prefix"))), F.lit(0)).alias("pstar"),
        F.max("k").alias("k"),
        F.max("b").alias("b"),
    )
    level = F.when(
        F.col("k") > F.col("mstar"),
        (F.col("b") - F.col("pstar")).cast("double")
        / (F.col("k") - F.col("mstar")),
    ).otherwise(F.col("b").cast("double"))
    level_row = lvl.select(level.alias("level"))
    return ordered.crossJoin(F.broadcast(level_row)).select(
        "source",
        F.col("t").alias("tokens"),
        F.round(F.least(F.col("t").cast("double"), F.col("level")), 6).alias(
            "allocation"
        ),
        (F.col("t").cast("double") > F.col("level")).alias("capped"),
    )


# -- per-source PII incidence report (round 9) ----------------------------------


@query(
    "pipeline_pii_report",
    oracle="""
    WITH seeded AS (
      SELECT doc_id, source,
             text
               || CASE WHEN doc_id % 2 = 0
                  THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                  THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                  ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN ' tel 555-0148' ELSE '' END
               AS t
      FROM documents
    ),
    per_doc AS (
      SELECT source,
             LENGTH(t) - LENGTH(regexp_replace(
               t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '', 'g'))
               AS email_chars,
             LENGTH(t) - LENGTH(regexp_replace(
               t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '', 'g')) AS ip_chars,
             LENGTH(t) - LENGTH(regexp_replace(
               t, '\\b[0-9]{3}-[0-9]{4}\\b', '', 'g')) AS phone_chars
      FROM seeded
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE email_chars + ip_chars
                                       + phone_chars > 0) AS BIGINT)
             AS docs_with_pii,
           CAST(SUM(email_chars) AS BIGINT) AS email_chars,
           CAST(SUM(ip_chars) AS BIGINT) AS ip_chars,
           CAST(SUM(phone_chars) AS BIGINT) AS phone_chars,
           ROUND(CAST(COUNT(*) FILTER (WHERE email_chars + ip_chars
                                             + phone_chars > 0) AS DOUBLE)
                 / COUNT(*), 6) AS pii_rate
    FROM per_doc GROUP BY source
    """,
)
def pipeline_pii_report(spark, sf_dir):
    """PER-SOURCE PII INCIDENCE REPORT — the compliance rollup a scrub
    pass ships beside its output (`text_pii_scrub` is the per-document
    redactor; this is the release artifact): per source, how many
    documents carried any PII class, and the removed-character budget
    per class. The corpus has no natural PII, so deterministic spans
    are seeded on modular doc_id classes (emails on even ids, IPs on
    %3, phones on %5) — giving every source a KNOWN mixed incidence
    profile instead of 100%. Same Java∩RE2 portable regexes as the
    scrub op; shape is one text pass + one low-cardinality groupBy —
    audit-priced at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" mail user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" tel 555-0148")).otherwise(
            F.lit("")
        ),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    phone = r"\b[0-9]{3}-[0-9]{4}\b"
    per_doc = d.select(
        "source",
        (F.length(t) - F.length(F.regexp_replace(t, email, ""))).alias(
            "email_chars"
        ),
        (F.length(t) - F.length(F.regexp_replace(t, ip, ""))).alias(
            "ip_chars"
        ),
        (F.length(t) - F.length(F.regexp_replace(t, phone, ""))).alias(
            "phone_chars"
        ),
    )
    has_pii = (
        F.col("email_chars") + F.col("ip_chars") + F.col("phone_chars") > 0
    ).cast("long")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(has_pii).alias("docs_with_pii"),
        F.sum("email_chars").alias("email_chars"),
        F.sum("ip_chars").alias("ip_chars"),
        F.sum("phone_chars").alias("phone_chars"),
        F.round(F.sum(has_pii).cast("double") / F.count("*"), 6).alias(
            "pii_rate"
        ),
    )


# -- source-concentration audit: Gini + HHI (round 9) ----------------------------


@query(
    "pipeline_token_gini",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    ordered AS (
      SELECT t, ROW_NUMBER() OVER (ORDER BY t, source) AS i FROM src
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(t) AS BIGINT) AS total,
             CAST(SUM(i * t) AS BIGINT) AS weighted,
             CAST(SUM(t * t) AS BIGINT) AS sumsq
      FROM ordered
    )
    SELECT k, total AS total_tokens,
           ROUND(2.0 * weighted / (k * total) - CAST(k + 1 AS DOUBLE) / k, 6)
             AS gini,
           ROUND(CAST(sumsq AS DOUBLE) / (CAST(total AS DOUBLE) * total), 6)
             AS hhi
    FROM agg
    """,
)
def pipeline_token_gini(spark, sf_dir):
    """SOURCE-CONCENTRATION audit — Gini coefficient and Herfindahl
    index of the token distribution across sources, the one-row summary
    a mixture report leads with ("is this corpus one giant crawl with
    garnish, or a balanced mixture?"). Gini from the sorted closed form
    2·Σ(i·tᵢ)/(k·T) − (k+1)/k; HHI = Σtᵢ²/T². Shape: the corpus scan is
    ONE map-side-combinable groupBy(source); the rank window runs over
    the k-row source frame only. Determinism: i·tᵢ and tᵢ² sums are
    exact BIGINTs (tᵢ < 2^31 here; a 100 TB run would widen to DECIMAL),
    so each output is one or two IEEE ops on identical integers,
    rounded to 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("t")
    )
    ordered = src.select(
        "t", F.row_number().over(W.orderBy("t", "source")).alias("i")
    )
    agg = ordered.agg(
        F.count("*").alias("k"),
        F.sum("t").alias("total"),
        F.sum(F.col("i") * F.col("t")).alias("weighted"),
        F.sum(F.col("t") * F.col("t")).alias("sumsq"),
    )
    return agg.select(
        "k",
        F.col("total").alias("total_tokens"),
        F.round(
            F.lit(2.0) * F.col("weighted") / (F.col("k") * F.col("total"))
            - (F.col("k") + 1).cast("double") / F.col("k"),
            6,
        ).alias("gini"),
        F.round(
            F.col("sumsq").cast("double")
            / (F.col("total").cast("double") * F.col("total")),
            6,
        ).alias("hhi"),
    )


# -- quality-gate funnel report (round 9, wave 5) ---------------------------------


@query(
    "pipeline_quality_funnel",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), w -> w <> '') AS toks,
             string_split(text, ' ') AS w
      FROM documents
    ),
    gopher AS (
      SELECT doc_id,
             (len(toks) BETWEEN 50 AND 100000
              AND list_sum(list_transform(toks, x -> LENGTH(x))) * 1.0
                  / len(toks) BETWEEN 3.0 AND 10.0
              AND len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                  * 1.0 / len(toks) >= 0.8
              AND len(list_filter(['the','a','and','of','to','in','is','it'],
                                  s -> list_contains(toks, s))) >= 2) AS keep
      FROM t
    ),
    rep AS (
      SELECT doc_id,
             (CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
                   ELSE 1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE)
              END > 0.5) AS is_repetitive
      FROM (
        SELECT doc_id,
               [array_to_string(w[i:i+1], ' ')
                FOR i IN range(1, GREATEST(len(w), 1))] AS g
        FROM t
      )
    ),
    lid AS (
      SELECT doc_id, lang,
             CASE WHEN GREATEST(v_en, v_de, v_fr, v_es) = 0 THEN 'und'
                  WHEN v_en >= GREATEST(v_de, v_fr, v_es) THEN 'en'
                  WHEN v_de >= GREATEST(v_fr, v_es) THEN 'de'
                  WHEN v_fr >= v_es THEN 'fr'
                  ELSE 'es' END AS pred
      FROM (
        SELECT doc_id, lang,
          len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS v_en,
          len(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS v_de,
          len(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS v_fr,
          len(list_filter(toks, x -> list_contains(['el','la','los','y','de'], x))) AS v_es
        FROM t
      )
    ),
    flags AS (
      SELECT g.doc_id, g.keep, r.is_repetitive, (l.pred = l.lang) AS lang_ok
      FROM gopher g JOIN rep r USING (doc_id) JOIN lid l USING (doc_id)
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS r1,
             CAST(COUNT(*) FILTER (WHERE keep AND is_repetitive)
                  AS BIGINT) AS r2,
             CAST(COUNT(*) FILTER (WHERE keep AND NOT is_repetitive
                                   AND NOT lang_ok) AS BIGINT) AS r3
      FROM flags
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'gopher_rules' AS name, n AS docs_in,
             r1 AS docs_rejected, n - r1 AS docs_out,
             ROUND(CAST(r1 AS DOUBLE) / n, 6) AS reject_rate
      FROM agg
      UNION ALL
      SELECT 2, 'repetition', n - r1, r2, n - r1 - r2,
             ROUND(CAST(r2 AS DOUBLE) / (n - r1), 6) FROM agg
      UNION ALL
      SELECT 3, 'langid_match', n - r1 - r2, r3, n - r1 - r2 - r3,
             ROUND(CAST(r3 AS DOUBLE) / (n - r1 - r2), 6) FROM agg
    )
    """,
)
def pipeline_quality_funnel(spark, sf_dir):
    """QUALITY-GATE FUNNEL — the per-rule rejection dashboard every
    curation report leads with (FineWeb/Dolma publish exactly this
    table): the registered quality gates applied in pipeline order —
    Gopher rule battery, then intra-doc repetition, then language-ID
    agreement — each stage reporting docs in / rejected / out and its
    conditional rejection rate. Composes the REGISTERED operators'
    own flag frames (`text_gopher_rules`.keep,
    `text_repetition_filter`.is_repetitive, `text_langid_confusion`'s
    prediction), so the funnel IS the pipeline; all counts come from
    ONE conditional aggregate over the joined flags (the three output
    rows are projections of a one-row agg, nothing driver-side). Each
    gate loads the corpus through its own registered operator — in a
    production run those per-doc flag frames are already materialized
    by the gates themselves, and the funnel only joins them."""
    from hiveberg_spark.registry import QUERIES

    gopher = QUERIES["text_gopher_rules"](spark, sf_dir).select(
        "doc_id", "keep"
    )
    rep = QUERIES["text_repetition_filter"](spark, sf_dir).select(
        "doc_id", "is_repetitive"
    )
    lid = QUERIES["text_langid_heuristic"](spark, sf_dir).select(
        "doc_id",
        (F.col("predicted_lang") == F.col("labeled_lang")).alias("lang_ok"),
    )
    flags = gopher.join(rep, "doc_id").join(lid, "doc_id")
    agg = flags.agg(
        F.count("*").alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("r1"),
        F.sum((F.col("keep") & F.col("is_repetitive")).cast("long")).alias(
            "r2"
        ),
        F.sum(
            (
                F.col("keep")
                & ~F.col("is_repetitive")
                & ~F.col("lang_ok")
            ).cast("long")
        ).alias("r3"),
    )
    n, r1, r2, r3 = F.col("n"), F.col("r1"), F.col("r2"), F.col("r3")

    # Round 15 (guide §2.4/§7.2): the three stage rows used to be a
    # UNION of three selects over `agg` — and Catalyst duplicates the
    # whole flags-join + aggregate subtree under each branch (captured
    # plan: 18 parquet scans, zero ReusedExchange — the corpus ran
    # through all three gates three times). One inline explode emits
    # the three projections of the single one-row aggregate.
    def stage_struct(stage, name, docs_in, rejected, docs_out, denom):
        return F.struct(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("name"),
            docs_in.alias("docs_in"),
            rejected.alias("docs_rejected"),
            docs_out.alias("docs_out"),
            F.round(rejected.cast("double") / denom, 6).alias("reject_rate"),
        )

    return agg.select(
        F.explode(
            F.array(
                stage_struct(1, "gopher_rules", n, r1, n - r1, n),
                stage_struct(2, "repetition", n - r1, r2, n - r1 - r2, n - r1),
                stage_struct(
                    3, "langid_match", n - r1 - r2, r3,
                    n - r1 - r2 - r3, n - r1 - r2,
                ),
            )
        ).alias("e")
    ).select("e.*")


# -- training shard manifest (round 9, wave 6) -------------------------------------

_N_SHARDS = 16


@query(
    "pipeline_shard_manifest",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS shard_id
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned GROUP BY shard_id
    """,
)
def pipeline_shard_manifest(spark, sf_dir):
    """TRAINING SHARD MANIFEST — the sizing table a dataloader build
    (WebDataset/Mosaic-style shards) emits before writing: every doc
    assigned to one of {_N_SHARDS} shards by a hash that is a pure
    function of doc_id (md5 prefix → uniform buckets, the
    `sample_stratified_split` determinism discipline — stable across
    runs, machines, and engines), with per-shard doc counts, byte
    budgets, and id ranges. The shard key is deliberately NOT
    monotone-in-id so every shard samples the whole corpus (no
    time/source skew inside a shard). One projection + one
    {_N_SHARDS}-key groupBy; the assignment column is the same
    zero-cost expression the actual partitioned write would use via
    `.repartition(shard_id)`."""
    d = load_table(spark, sf_dir, "documents")
    m = F.md5(F.col("doc_id").cast("string"))
    # hex-digit position lookup: exactly uniform over the 16 shards and
    # identical in both engines (ascii-arithmetic mod 16 degenerates:
    # 256 is divisible by 16, and hex chars cover only 10 residues)
    shard = (
        F.instr(F.lit("0123456789abcdef"), F.substring(m, 1, 1)) - 1
    ).cast("long")
    return (
        d.select(shard.alias("shard_id"), "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# -- length-bucketed batching efficiency (round 9, wave 9) ---------------------------

_LB_BATCH = 8  # docs per training batch


@query(
    "pipeline_length_bucketed_batches",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    ordered AS (
      SELECT doc_id, n,
             (ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1)
               // {_LB_BATCH} AS batch_id
      FROM toks
    ),
    naive AS (
      SELECT doc_id, n,
             (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)
               // {_LB_BATCH} AS batch_id
      FROM toks
    ),
    b AS (
      SELECT CAST(SUM(mx * cnt - s) AS BIGINT) AS pad FROM (
        SELECT MAX(n) AS mx, COUNT(*) AS cnt, SUM(n) AS s
        FROM ordered GROUP BY batch_id)
    ),
    nv AS (
      SELECT CAST(SUM(mx * cnt - s) AS BIGINT) AS pad FROM (
        SELECT MAX(n) AS mx, COUNT(*) AS cnt, SUM(n) AS s
        FROM naive GROUP BY batch_id)
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS real_tokens FROM toks)
    SELECT tot.real_tokens, b.pad AS bucketed_pad_tokens,
           nv.pad AS naive_pad_tokens,
           ROUND(CAST(b.pad AS DOUBLE) / (tot.real_tokens + b.pad), 6)
             AS bucketed_pad_frac,
           ROUND(CAST(nv.pad AS DOUBLE) / (tot.real_tokens + nv.pad), 6)
             AS naive_pad_frac,
           (b.pad <= nv.pad) AS bucketing_helps
    FROM b, nv, tot
    """,
)
def pipeline_length_bucketed_batches(spark, sf_dir):
    """LENGTH-BUCKETED BATCHING efficiency — the padding audit behind
    dynamic batching (group similar-length documents into batches of
    {_LB_BATCH} so each batch pads to ITS max length, not the corpus
    max): total padded tokens under length-sorted batching vs naive
    id-order batching, as one summary row with the structural pin that
    sorting can never pad MORE (batch maxima are minimized by sorted
    assignment). All counts exact integers. Both batch assignments run
    the TWO-PHASE distributed form (VERDICT r9 #4): `global_positions`
    range-partitions the (doc_id, n) pairs on the batch order and
    decodes per-partition offsets — one range exchange per ordering,
    never a full-corpus Exchange SinglePartition window (plan-pinned by
    tests/test_round10_plans.py); the pad arithmetic is unchanged."""
    toks = persist_tracked(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        )
    )

    def pad(ordered_by):
        pos = global_positions(toks, ordered_by, 8)
        per_batch = (
            pos.withColumn(
                "batch_id", F.floor((F.col("position") - 1) / _LB_BATCH)
            )
            .groupBy("batch_id")
            .agg((F.max("n") * F.count("*") - F.sum("n")).alias("p"))
        )
        return per_batch.agg(F.sum("p").alias("pad"))

    pad_sorted = pad([F.asc("n"), F.asc("doc_id")]).withColumnRenamed(
        "pad", "bucketed_pad_tokens"
    )
    pad_naive = pad([F.asc("doc_id")]).withColumnRenamed(
        "pad", "naive_pad_tokens"
    )
    tot = toks.agg(F.sum("n").alias("real_tokens"))
    return (
        tot.crossJoin(F.broadcast(pad_sorted))
        .crossJoin(F.broadcast(pad_naive))
        .select(
            "real_tokens",
            "bucketed_pad_tokens",
            "naive_pad_tokens",
            F.round(
                F.col("bucketed_pad_tokens").cast("double")
                / (F.col("real_tokens") + F.col("bucketed_pad_tokens")),
                6,
            ).alias("bucketed_pad_frac"),
            F.round(
                F.col("naive_pad_tokens").cast("double")
                / (F.col("real_tokens") + F.col("naive_pad_tokens")),
                6,
            ).alias("naive_pad_frac"),
            (
                F.col("bucketed_pad_tokens") <= F.col("naive_pad_tokens")
            ).alias("bucketing_helps"),
        )
    )


# -- curriculum phase assignment (round 9, wave 12) ----------------------------------


@query(
    "pipeline_curriculum_phases",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS score
      FROM documents
    ),
    cum AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM scored
    ),
    th AS (
      SELECT MIN(CASE WHEN rn >= n / 3.0 THEN score END) AS t1,
             MIN(CASE WHEN rn >= 2 * n / 3.0 THEN score END) AS t2
      FROM cum
    ),
    phased AS (
      SELECT s.*,
             CASE WHEN s.score <= th.t1 THEN 1
                  WHEN s.score <= th.t2 THEN 2
                  ELSE 3 END AS phase
      FROM scored s, th
    )
    SELECT CAST(phase AS INTEGER) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(20,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score
    FROM phased GROUP BY phase
    """,
)
def pipeline_curriculum_phases(spark, sf_dir):
    """CURRICULUM PHASE assignment — order the corpus by a difficulty
    proxy (type-token ratio: repetitive/templated text is "easy",
    lexically dense text is "hard") and split it into three training
    phases at the exact tercile boundaries, reporting each phase's doc
    and token budget. The thresholds use the VALUE-CROSSING rule
    (`agg_weighted_percentile`'s trick — the smallest score whose rank
    reaches n/3): two scalar thresholds broadcast back, so the
    PER-DOCUMENT assignment is a stateless comparison. The rank pass
    itself is the DISTRIBUTED two-phase `global_positions` over the
    (score, id) pairs — one range exchange, never an
    Exchange SinglePartition of the corpus — so at 100 TB both the
    ranking and every epoch's phase filter scale. Scores are 6-dp-rounded doubles both
    engines produce identically; phase means divide exact DECIMAL sums."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = persist_tracked(
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
                "score"
            ),
        )
    )
    # tercile ranks via the TWO-PHASE form (VERDICT r9 #3): rank only
    # the (score, doc_id) pairs with `global_positions` (one range
    # exchange + broadcast offsets — no single-task corpus window),
    # then reduce to the two value-crossing thresholds in one
    # partial-then-final aggregate.
    pos = global_positions(
        scored.select("doc_id", "score"),
        [F.asc("score"), F.asc("doc_id")],
        8,
        position_col="rn",
    )
    n = scored.agg(F.count("*").alias("n_total"))
    th = pos.crossJoin(F.broadcast(n)).agg(
        F.min(
            F.when(F.col("rn") >= F.col("n_total") / 3.0, F.col("score"))
        ).alias("t1"),
        F.min(
            F.when(F.col("rn") >= 2 * F.col("n_total") / 3.0, F.col("score"))
        ).alias("t2"),
    )
    phase = (
        F.when(F.col("score") <= F.col("t1"), 1)
        .when(F.col("score") <= F.col("t2"), 2)
        .otherwise(3)
    )
    thresholds = th  # one-row tercile boundaries
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .withColumn("phase", phase)
        .groupBy("phase")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum(F.col("score").cast("decimal(20,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
        )
    )


# -- quality-tiered upsampling schedule (round 10) ----------------------------------

#: epochs per quality tier, low → high (the "repeat good data" knob)
_UPSAMPLE_EPOCHS = (1, 2, 4)


@query(
    "pipeline_quality_upsampling",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS score
      FROM documents
    ),
    cum AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM scored
    ),
    th AS (
      SELECT MIN(CASE WHEN rn >= n / 3.0 THEN score END) AS t1,
             MIN(CASE WHEN rn >= 2 * n / 3.0 THEN score END) AS t2
      FROM cum
    ),
    tiered AS (
      SELECT s.n_tokens,
             CASE WHEN s.score <= th.t1 THEN 1
                  WHEN s.score <= th.t2 THEN 2
                  ELSE 3 END AS tier
      FROM scored s, th
    ),
    agg AS (
      SELECT tier,
             CASE tier WHEN 1 THEN {_UPSAMPLE_EPOCHS[0]}
                       WHEN 2 THEN {_UPSAMPLE_EPOCHS[1]}
                       ELSE {_UPSAMPLE_EPOCHS[2]} END AS epochs,
             COUNT(*) AS n_docs,
             SUM(n_tokens) AS raw_tokens
      FROM tiered GROUP BY tier
    )
    SELECT CAST(tier AS INTEGER) AS tier,
           CAST(epochs AS INTEGER) AS epochs,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(raw_tokens AS BIGINT) AS raw_tokens,
           CAST(epochs * raw_tokens AS BIGINT) AS effective_tokens,
           ROUND(epochs * raw_tokens * 1.0
                 / SUM(epochs * raw_tokens) OVER (), 6)
             AS effective_share
    FROM agg
    """,
)
def pipeline_quality_upsampling(spark, sf_dir):
    """QUALITY-TIERED UPSAMPLING schedule — the "repeat the best data"
    epoch plan (the move behind doing >1 epoch on curated slices while
    web-crawl sees the data once): split the corpus into quality
    terciles on type-token ratio (the `pipeline_curriculum_phases`
    score) and assign {_UPSAMPLE_EPOCHS} epochs low→high, reporting
    each tier's raw vs EFFECTIVE token budget and its share of the
    training mix after repetition. Thresholds come from the same
    distributed two-phase rank (`global_positions` over (score, id)
    pairs — no single-task corpus window); the final share divides
    exact integer token sums over the 3-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = persist_tracked(
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
                "score"
            ),
        )
    )
    pos = global_positions(
        scored.select("doc_id", "score"),
        [F.asc("score"), F.asc("doc_id")],
        8,
        position_col="rn",
    )
    n = scored.agg(F.count("*").alias("n_total"))
    th = pos.crossJoin(F.broadcast(n)).agg(
        F.min(
            F.when(F.col("rn") >= F.col("n_total") / 3.0, F.col("score"))
        ).alias("t1"),
        F.min(
            F.when(F.col("rn") >= 2 * F.col("n_total") / 3.0, F.col("score"))
        ).alias("t2"),
    )
    tier = (
        F.when(F.col("score") <= F.col("t1"), 1)
        .when(F.col("score") <= F.col("t2"), 2)
        .otherwise(3)
    )
    epochs = (
        F.when(F.col("tier") == 1, _UPSAMPLE_EPOCHS[0])
        .when(F.col("tier") == 2, _UPSAMPLE_EPOCHS[1])
        .otherwise(_UPSAMPLE_EPOCHS[2])
        .cast("int")
    )
    agg = (
        scored.crossJoin(F.broadcast(th))
        .withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("raw_tokens"),
        )
        .withColumn("epochs", epochs)
        .withColumn(
            "effective_tokens", F.col("epochs") * F.col("raw_tokens")
        )
    )
    tot = agg.agg(F.sum("effective_tokens").alias("tot_eff"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "tier",
        "epochs",
        "n_docs",
        "raw_tokens",
        "effective_tokens",
        F.round(
            F.col("effective_tokens") * 1.0 / F.col("tot_eff"), 6
        ).alias("effective_share"),
    )


# -- quality-based cluster survivorship (round 10) ----------------------------------


@query(
    "dedup_cluster_best_quality",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_ORACLE}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v
    ),
    comp AS (SELECT v AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY v),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(len(list_distinct(string_split(text, ' '))) * 1000000.0
                        / len(string_split(text, ' '))) AS BIGINT) AS s6
      FROM documents
    )
    SELECT comp.doc_id, comp.cluster_rep,
           (comp.doc_id = arg_max(comp.doc_id,
                 scored.s6 * 10000000000 + (9999999999 - comp.doc_id))
              OVER (PARTITION BY comp.cluster_rep)) AS is_kept
    FROM comp JOIN scored USING (doc_id)
    """,
)
def dedup_cluster_best_quality(spark, sf_dir):
    """QUALITY-BASED cluster survivorship — `dedup_cluster_pick` keeps
    the MIN-ID doc per near-dup cluster; real pipelines keep the BEST
    doc (highest quality score, e.g. the untruncated original instead
    of the mangled mirror). Survivor = arg-max of (type-token-ratio
    score, then lower doc_id) per connected component of the LSH pair
    graph, via one exact integer ordering key: score·1e6 (already a
    6-dp integer grid) · 1e10 + (1e10−1−doc_id) — identical arithmetic
    both engines, tie-stable. Scale: the same label-propagation CC as
    cluster_pick plus ONE cluster-keyed max_by aggregate broadcast back
    — survivorship policy changes never touch the pair machinery."""
    docs = persist_tracked(load_table(spark, sf_dir, "documents"))
    sh = persist_tracked(shingled(docs))
    pairs = ngram_jaccard_pairs(sh, JACCARD_THRESHOLD, SHINGLE_DF_CAP).select(
        "doc_a", "doc_b"
    )
    labels = label_components(pairs)
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks)) * F.lit(1000000.0) / F.size(toks)
        )
        .cast("long")
        .alias("s6"),
    )
    comp = labels.select(
        F.col("v").alias("doc_id"), F.col("label").alias("cluster_rep")
    ).join(scored, "doc_id")
    ordk = F.col("s6") * F.lit(10000000000) + (
        F.lit(9999999999) - F.col("doc_id")
    )
    best = comp.groupBy("cluster_rep").agg(
        F.max_by("doc_id", ordk).alias("best_doc")
    )
    # plain keyed join (AQE broadcasts when it fits): `best` is one row
    # per CLUSTER — corpus-scaling, so no forced broadcast hint
    return comp.join(best, "cluster_rep").select(
        "doc_id",
        "cluster_rep",
        (F.col("doc_id") == F.col("best_doc")).alias("is_kept"),
    )


# -- top-mass (nucleus) selection (round 10) ----------------------------------------

_NUCLEUS_P = 0.5  # keep the highest-scoring docs holding this score mass


def global_prefix_sums(
    df: DataFrame,
    order_cols,
    value_col: str,
    n_partitions: int,
    prefix_col: str = "prefix",
) -> DataFrame:
    """Distributed RUNNING SUM over an arbitrary total order — the
    SUM-analog of `global_positions` (same two-phase shape as
    `token_budget_packing`): range-partition on the order key,
    per-partition running sums (parallel windows), then add each
    partition's offset from the broadcast cumsum of the n_partitions
    per-partition totals. Never a single-task corpus window. The order
    must end in a unique tiebreaker column (see `global_positions`)."""
    parts = persist_tracked(
        df.repartitionByRange(n_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = parts.withColumn(
        "_local_prefix",
        F.sum(value_col).over(
            W.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("_ptotal"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptotal").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *df.columns,
        (F.col("_local_prefix") + F.col("_offset")).alias(prefix_col),
    )


@query(
    "sample_nucleus_topmass",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(ROUND(len(list_distinct(string_split(text, ' '))) * 1000000.0
                        / len(string_split(text, ' '))) AS BIGINT) AS s6
      FROM documents
    ),
    tot AS (SELECT SUM(s6) AS total FROM scored),
    run AS (
      SELECT doc_id, s6,
             SUM(s6) OVER (ORDER BY s6 DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
      FROM scored
    )
    SELECT doc_id, s6 AS score_micro,
           (cum <= CAST(FLOOR({_NUCLEUS_P} * tot.total) AS BIGINT)) AS kept
    FROM run, tot
    """,
)
def sample_nucleus_topmass(spark, sf_dir):
    """TOP-MASS ("nucleus") corpus selection — keep the highest-quality
    documents that together hold the top {_NUCLEUS_P:.0%} of total
    quality mass (the cumulative-mass cousin of DSIR's top-k-by-rank:
    budget by MASS, not count, so a few excellent docs can satisfy the
    budget early). Scores live on an exact integer micro-grid
    (round(TTR·1e6)) so the running sum is INTEGER arithmetic — no
    float-order drift at any scale. The running sum is the DISTRIBUTED
    two-phase prefix sum (`global_prefix_sums`, the
    `token_budget_packing` machinery generalized): one range exchange,
    parallel per-partition windows, broadcast 8-row offsets — never a
    full-corpus Exchange SinglePartition window."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = persist_tracked(
        d.select(
            "doc_id",
            F.round(
                F.size(F.array_distinct(toks))
                * F.lit(1000000.0)
                / F.size(toks)
            )
            .cast("long")
            .alias("s6"),
        )
    )
    run = global_prefix_sums(
        scored, [F.desc("s6"), F.asc("doc_id")], "s6", 8, prefix_col="cum"
    )
    tot = scored.agg(F.sum("s6").alias("total"))
    return run.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.col("s6").alias("score_micro"),
        (
            F.col("cum")
            <= F.floor(F.lit(_NUCLEUS_P) * F.col("total")).cast("long")
        ).alias("kept"),
    )


# -- Neyman allocation (round 10, wave 11) -------------------------------------------


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(n_chars) AS s1, SUM(n_chars * n_chars) AS s2
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, n_docs,
             SQRT(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n_docs AS DOUBLE) * (n_docs - 1))) AS s_chars
      FROM s
    ),
    wgt AS (SELECT *, n_docs * s_chars AS wh FROM sd),
    tot AS (SELECT SUM(wh) AS wt FROM wgt),
    share AS (
      SELECT source, n_docs, s_chars, wh * 1000.0 / t.wt AS share
      FROM wgt CROSS JOIN tot t
    ),
    base AS (
      SELECT *, CAST(FLOOR(share) AS BIGINT) AS b,
             share - FLOOR(share) AS rem,
             SUM(CAST(FLOOR(share) AS BIGINT)) OVER () AS btot,
             ROW_NUMBER() OVER (ORDER BY share - FLOOR(share) DESC, source)
               AS rr
      FROM share
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(s_chars, 6) AS s_chars,
           CAST(b + CASE WHEN rr <= 1000 - btot THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc
    FROM base
    """,
)
def sample_neyman_allocation(spark, sf_dir):
    """NEYMAN-OPTIMAL stratified sampling allocation: a 1000-document
    eval-sample budget split across sources proportionally to
    N_h·S_h (stratum size × within-stratum length stddev) — the
    textbook minimum-variance design, vs the proportional-allocation
    baseline sample_stratified_split uses. Integerization is the
    LARGEST-REMAINDER method so allocations sum to exactly the budget.
    Determinism: stddev comes from exact INTEGER power sums (one sqrt
    per source row), shares divide once, and the remainder rank breaks
    ties on source. Scale: one source-keyed aggregate; every window
    runs on the #sources frame (a catalog constant, allowlisted) — the
    corpus is touched exactly once."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    sd = s.select(
        "source",
        "n_docs",
        F.sqrt(
            (F.col("n_docs") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n_docs").cast("double") * (F.col("n_docs") - 1))
        ).alias("s_chars"),
    )
    wgt = persist_tracked(
        sd.withColumn("wh", F.col("n_docs") * F.col("s_chars"))
    )  # consumed by the total row and the share projection
    tot = wgt.agg(F.sum("wh").alias("wt"))
    share = wgt.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("wh") * 1000.0 / F.col("wt")
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    base = (
        share.withColumn("b", F.floor("share").cast("long"))
        .withColumn("rem", F.col("share") - F.floor("share"))
        .withColumn("btot", F.sum("b").over(w_all))
        .withColumn(
            "rr",
            F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source"))),
        )
    )
    return base.select(
        "source",
        "n_docs",
        F.round("s_chars", 6).alias("s_chars"),
        (
            F.col("b")
            + F.when(F.col("rr") <= 1000 - F.col("btot"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_alloc"),
    )


# -- quality/token tradeoff frontier (round 10, wave 15) -----------------------------


@query(
    "pipeline_quality_token_tradeoff",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sc AS (SELECT doc_id, len(toks) AS n_toks,
                  (len(list_distinct(toks)) * 1000000) // len(toks)
                    AS score_micro FROM t),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
                      AS rn,
                 COUNT(*) OVER () AS n, SUM(n_toks) OVER () AS tot FROM sc),
    fr AS (SELECT UNNEST([25, 50, 75, 100]) AS pct),
    kept AS (
      SELECT fr.pct, r.* FROM r, fr WHERE r.rn <= (r.n * fr.pct + 99) // 100
    )
    SELECT CAST(pct AS INTEGER) AS pct, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_toks) AS BIGINT) AS tokens_kept,
           ROUND(SUM(n_toks) * 1.0 / MAX(tot), 6) AS token_share,
           ROUND(CAST(SUM(score_micro) AS DOUBLE) / COUNT(*) / 1000000, 6)
             AS mean_score
    FROM kept GROUP BY pct
    """,
)
def pipeline_quality_token_tradeoff(spark, sf_dir):
    """QUALITY-vs-TOKEN-BUDGET frontier — the curve every curation
    decision reads: keeping the top 25/50/75/100% of documents by
    quality (integer-micro TTR, exact integer division both engines),
    how many TOKENS survive and at what mean quality. On the fixture
    the top quality quartile holds only ~10% of tokens — exactly the
    high-TTR-means-short-docs tension this op exists to expose before
    anyone commits to a threshold. Scale: ONE distributed
    `global_positions` rank over (score, doc_id), one-row totals
    broadcast, a 4-row literal fraction frame; membership at each
    fraction is a stateless rank predicate — no per-fraction rescans,
    no single-task windows."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sc = d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.expr(
            "(size(array_distinct(split(text, ' '))) * 1000000)"
            " div size(split(text, ' '))"
        ).alias("score_micro"),
    )
    pos = global_positions(
        sc, [F.desc("score_micro"), F.asc("doc_id")], 8, position_col="rn"
    )
    nu = sc.agg(F.count("*").alias("n"), F.sum("n_toks").alias("tot"))
    fr = spark.range(1).select(
        F.explode(
            F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(100))
        ).alias("pct")
    )
    kept = (
        pos.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(fr))
        .filter(F.col("rn") <= F.expr("(n * pct + 99) div 100"))
    )
    return kept.groupBy(F.col("pct").cast("int").alias("pct")).agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_toks").alias("tokens_kept"),
        F.round(F.sum("n_toks") * 1.0 / F.max("tot"), 6).alias("token_share"),
        F.round(
            F.sum("score_micro").cast("double") / F.count("*") / 1000000, 6
        ).alias("mean_score"),
    )


# -- documents -> embeddings backfill (round 11) --------------------------------------

_EMB_BACKFILL_ORACLE = """
    WITH seeded AS (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 0),
    miss AS (SELECT doc_id, text FROM documents
             WHERE doc_id NOT IN (SELECT vec_id FROM seeded))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM seeded) AS n_preexisting,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM miss) AS n_missing,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM miss) AS n_backfilled,
           (SELECT CAST(SUM(LENGTH(text)) AS BIGINT) FROM miss)
             AS backfilled_chars_sum,
           TRUE AS coverage_ok,
           TRUE AS norm_ok
"""


@query("pipeline_embedding_backfill", oracle=_EMB_BACKFILL_ORACLE)
def pipeline_embedding_backfill(spark, sf_dir):
    """DOCUMENTS -> EMBEDDINGS BACKFILL (VERDICT r10 #8) — the pipeline
    op that joins the text tier to the ANN tier: the embedding STORE is
    a snapshot table seeded with a coverage gap (every 7th vec_id
    withheld — simulating documents ingested after the last embedding
    run); the backfill job anti-joins documents against the store to
    find the uncovered tier, featurizes ONLY those documents into
    deterministic 8-dim surrogate vectors (text-statistic features,
    L2-normalized — the stand-in for a model encoder, chosen to be
    SQL-expressible so the audit stays differential), and APPENDS them
    to the store — the same build/refresh lifecycle the BM25/IVF/dedup
    state tables follow, O(missing) per run.

    Driver row: n_missing is measured from the document side, while
    n_backfilled is the store's SNAPSHOT GROWTH (final minus seeded
    count) — the oracle pins both to the same DuckDB count, so a
    backfill that drops or double-appends rows diverges on a visible
    number; backfilled_chars_sum is an exact-integer checksum OVER THE
    ROWS THE ANTI-JOIN SELECTED; coverage_ok pins that every document
    id exists in the store after the run (anti-join empty), norm_ok
    that every backfilled vector actually normalized (|l2-1| < 1e-4 on
    the stored float array). Scale: one keyed anti-join + one append;
    no full-store rewrite."""
    import os

    from hiveberg_spark.operators.timetravel import _lock, warehouse_dir
    from hiveberg_spark.sources.snapshot_table import build_once

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "embeddings")

    def featurize(docs):
        n_chars = F.length("text").cast("double")
        words = F.split("text", " ")
        strip = lambda pat: (  # noqa: E731
            F.length("text") - F.length(F.regexp_replace("text", pat, ""))
        ).cast("double")
        raw = F.array(
            n_chars,
            F.size(words).cast("double"),
            strip("[aeiou]"),
            strip("[0-9]"),
            strip(" "),
            F.size(F.array_distinct(words)).cast("double"),
            strip("[.,!?]"),
            F.lit(1.0),
        )
        nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
        return docs.select(
            F.col("doc_id").alias("vec_id"),
            F.lit(-1).cast("long").alias("label"),
            F.transform(raw, lambda x: (x / nrm).cast("float")).alias(
                "embedding"
            ),
        )

    seeded = e.filter(F.col("vec_id") % 7 != 0).select(
        "vec_id", "label", F.col("embedding").cast("array<float>").alias("embedding")
    )
    missing = d.join(
        seeded.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
    )

    with _lock:
        wh = warehouse_dir(sf_dir)

        def build_store(t):
            t.append(seeded)
            t.append(featurize(missing))  # backfill = O(missing rows)

        store_t = build_once(
            spark,
            os.path.join(wh, "emb_backfill_store"),
            build_store,
            schema="vec_id long, label long, embedding array<float>",
        )

    s1 = store_t.first_snapshot_id()
    store0 = store_t.scan(snapshot_id=s1, virtual_column=None)
    store = store_t.scan(virtual_column=None)
    backfilled = store_t.scan_changes(s1, virtual_column=None)

    n_docs = d.agg(F.count("*").cast("long").alias("n_docs"))
    n_pre = store0.agg(F.count("*").cast("long").alias("n_preexisting"))
    n_missing = missing.agg(F.count("*").cast("long").alias("n_missing"))
    growth = store.agg(F.count("*").alias("_n_store")).crossJoin(
        store0.agg(F.count("*").alias("_n_store0"))
    )
    chars = missing.agg(
        F.sum(F.length("text")).cast("long").alias("backfilled_chars_sum")
    )
    coverage = (
        d.select("doc_id")
        .join(
            store.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
        )
        .agg((F.count("*") == 0).alias("coverage_ok"))
    )
    nrm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    # coalesce: a fixture with FULL embedding coverage backfills zero
    # rows, making max-over-empty NULL; the audit is vacuously true
    # there (nothing was written out-of-norm), matching the oracle's
    # unconditional TRUE (round-12 ADVICE)
    norm_ok = backfilled.agg(
        F.coalesce(F.max(F.abs(nrm - 1.0)) < 1e-4, F.lit(True)).alias(
            "norm_ok"
        )
    )
    return (
        n_docs.crossJoin(n_pre)
        .crossJoin(n_missing)
        .crossJoin(growth)
        .crossJoin(chars)
        .crossJoin(coverage)
        .crossJoin(norm_ok)
        .select(
            "n_docs",
            "n_preexisting",
            "n_missing",
            (F.col("_n_store") - F.col("_n_store0"))
            .cast("long")
            .alias("n_backfilled"),
            "backfilled_chars_sum",
            "coverage_ok",
            "norm_ok",
        )
    )
