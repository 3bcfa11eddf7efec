"""Scalar-quantized (int8) similarity search [N] — the storage/bandwidth
side of ANN at 100 TB, complementing the recall-side buckets in
simsearch.py (hyperplane LSH, IVF).

Technique (the standard SQ8 pattern, e.g. Faiss IndexScalarQuantizer):
per-dimension min/max over the corpus define a linear int8 code; the
scan-and-score pass runs on codes (4× fewer bytes than float32 — at
100 TB that is the difference between a 25 TB and a 100 TB scan), then
only the top `RERANK_FACTOR × k` candidates per query are re-scored
with exact float cosine. Registered to the driver as the
`simsearch_sq8_rerank` recall contract (VERDICT r4 #3): the coarse
ranking itself is quantization-dependent, so the oracle pins the
contract row, not the ranks; exact-score agreement of overlapping hits
is asserted in tests/test_llm_ops.py.

In this demo both the codes and the raw vectors live in one in-memory
frame; a production deployment materializes the code table once (same
snapshot-table machinery as every other table here) and scans it
instead of the float table — the plumbing, not the math, is the only
difference.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, Window as W, functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query
from hiveberg_spark.operators.simsearch import (
    RECALL_CONTRACT_SQL,
    TOP_K,
    _N_QUERIES,
    _dot,
    _norm,
    recall_contract,
    simsearch_bruteforce_topk,
)

RERANK_FACTOR = 4  # exact-rescored candidates per query = factor × k


def _dimension_bounds(e: DataFrame) -> DataFrame:
    """One row: (mins: array<double>, maxs: array<double>) per-dimension
    corpus bounds — a tiny all-reduce (posexplode → per-dim min/max →
    sorted re-assembly), no driver-side collect."""
    flat = e.select(F.posexplode("embedding").alias("pos", "v"))
    per_dim = flat.groupBy("pos").agg(
        F.min(F.col("v").cast("double")).alias("mn"),
        F.max(F.col("v").cast("double")).alias("mx"),
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s.mn
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s.mx
        ).alias("maxs"),
    )


def _quantize(vec, mins, maxs):
    """int8 code per element: round(254 * (x-mn)/(mx-mn)) - 127, with
    degenerate (mx == mn) dimensions coded 0."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    return F.transform(
        idx,
        lambda i: F.when(
            F.element_at(maxs, i + 1) > F.element_at(mins, i + 1),
            (
                F.round(
                    F.lit(254.0)
                    * (F.element_at(vec, i + 1).cast("double") - F.element_at(mins, i + 1))
                    / (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
                )
                - F.lit(127)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )


def sq8_topk(spark, sf_dir):
    """Int8 scalar-quantization search with exact rerank: score the
    whole corpus on int8 codes (integer dot product — the bandwidth-
    and SIMD-friendly pass), keep the top RERANK_FACTOR×k per query,
    re-score those with exact float cosine, return the top k.

    Output schema matches simsearch_bruteforce_topk (qid, vec_id,
    cosine) — the recall contract and tests measure overlap directly."""
    e = load_table(spark, sf_dir, "embeddings")
    bounds = _dimension_bounds(e)  # 1 row; AQE broadcasts the join
    coded = e.crossJoin(bounds).select(
        "vec_id",
        "embedding",
        _quantize(F.col("embedding"), F.col("mins"), F.col("maxs")).alias("code"),
    )
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("code").alias("qcode"),
    )
    approx = (
        coded.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "qv",
            "embedding",
            F.aggregate(
                F.zip_with(
                    F.col("qcode"), F.col("code"), lambda x, y: (x * y).cast("long")
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    wq = W.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("vec_id"))
    survivors = approx.withColumn("crn", F.row_number().over(wq)).filter(
        F.col("crn") <= TOP_K * RERANK_FACTOR
    )
    exact = survivors.select(
        "qid",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine")
    )


# Measured recall with a 4×k exact rerank: 1.00 (sf0.001) / 0.98
# (sf0.01) — int8 on 64-dim vectors is near-lossless for ranking.
# Bound 0.9 = the long-standing test floor.
_SQ8_RECALL_BOUND = 0.9


@query("simsearch_sq8_rerank", oracle=RECALL_CONTRACT_SQL)
def simsearch_sq8_rerank(spark, sf_dir):
    """SQ8 search as a driver-checked recall contract (VERDICT r4 #3):
    the quantize→coarse-score→rerank pipeline (sq8_topk) measured
    against the exact baseline, one pinned row."""
    return recall_contract(
        simsearch_bruteforce_topk(spark, sf_dir),
        sq8_topk(spark, sf_dir),
        _SQ8_RECALL_BOUND,
    )


# -- Product quantization + ADC scan [N] ------------------------------------

PQ_M = 8          # subspaces (64-dim embedding -> 8 x 8-dim subvectors)
PQ_K = 16         # centroids per subspace -> 4 bits/subspace, 8 codes/vector
PQ_TRAIN_CAP = 2048  # deterministic bounded training sample (Faiss-style)
PQ_RERANK = 16    # exact-rescored candidates per query = factor x k

# Measured recall@5 with the 16xk rerank: 0.96 (sf0.001) / 0.82
# (sf0.01, the driver's gate) / 0.70 (sf0.1) — 4-bit codes lose more
# ranking signal as distractors grow, exactly the PQ trade. Bound 0.6
# sits under all three; the quantizer is deterministic, so only a real
# regression flips it.
_PQ_RECALL_BOUND = 0.6


def _pq_train_matrix(X):
    """Lloyd-iterate PQ codebooks over an in-memory training matrix
    (first-k init, 5 iterations: bit-for-bit reproducible)."""
    import numpy as np

    d = X.shape[1] // PQ_M
    centroids = np.zeros((PQ_M, PQ_K, d))
    for j in range(PQ_M):
        sub = X[:, j * d : (j + 1) * d]
        C = sub[:PQ_K].copy()
        for _ in range(5):
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * sub @ C.T
                + (C**2).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            for c in range(PQ_K):
                pts = sub[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        centroids[j] = C
    return centroids


def _pq_train(spark, e):
    """Train the product quantizer on a DETERMINISTIC bounded sample
    (lowest vec_ids, capped — the standard Faiss practice: codebooks
    come from a fixed-size sample however big the corpus, so this
    driver-side numpy step is O(cap), never O(corpus)). Vectors are
    L2-normalized first so ADC inner products approximate cosine.
    Plain Lloyd iterations, first-k init: bit-for-bit reproducible."""
    import numpy as np

    rows = (
        e.orderBy("vec_id")
        .limit(PQ_TRAIN_CAP)
        .select("embedding")
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return _pq_train_matrix(X)


def _pq_codes(spark, e: DataFrame, centroids, R=None) -> DataFrame:
    """Distributed PQ encoding (Arrow-batched pandas_udf, numpy argmin
    per subspace). With `R` (d x d rotation), vectors are rotated AFTER
    L2 normalization and BEFORE subspace split — the OPQ placement."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    cent_b = spark.sparkContext.broadcast(centroids)
    rot_b = spark.sparkContext.broadcast(R)

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        C = cent_b.value
        X = np.stack(col.to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        if rot_b.value is not None:
            X = X @ rot_b.value
        out = np.zeros((len(X), C.shape[0]), dtype=np.int32)
        sd = C.shape[2]
        for j in range(C.shape[0]):
            sub = X[:, j * sd : (j + 1) * sd]
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * sub @ C[j].T
                + (C[j] ** 2).sum(1)[None, :]
            )
            out[:, j] = d2.argmin(1)
        return pd.Series(list(out))

    return e.withColumn("codes", encode("embedding")).select("vec_id", "codes")


def _adc_rerank_contract(
    spark,
    e: DataFrame,
    codes: DataFrame,
    centroids,
    bound: float,
    sf_dir: str,
    R=None,
) -> DataFrame:
    """Shared ADC scan + exact rerank + recall contract: each query
    precomputes its m x k lookup table of subspace dot products (rotated
    like the corpus when `R` is set), a candidate's ADC score is m pure
    JVM array lookups summed via F.aggregate, and the top
    rerank-factor x k ADC candidates are re-scored with exact float
    cosine on the ORIGINAL vectors (a rotation preserves cosine, so the
    rerank needs no R)."""
    import numpy as np
    from pyspark.sql import Window

    m, k, d = centroids.shape
    q_rows = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .orderBy("vec_id")
        .collect()
    )
    lut_rows = []
    for r in q_rows:
        qv = np.array(r.embedding, dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        if R is not None:
            qv = qv @ R
        lut = np.zeros(m * k)
        for j in range(m):
            lut[j * k : (j + 1) * k] = centroids[j] @ qv[j * d : (j + 1) * d]
        lut_rows.append((r.vec_id, [float(x) for x in lut]))
    q = spark.createDataFrame(lut_rows, "qid long, lut array<double>")

    # ADC scan: pure JVM — m lookups + adds per (candidate, query)
    adc = (
        codes.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn(
            "adc",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    "lut", (j * k + F.element_at("codes", j + 1) + 1).cast("int")
                ),
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("adc").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= PQ_RERANK * TOP_K)
        .select("qid", "vec_id", "adc")
    )
    # exact rerank of the small candidate set
    qe = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = (
        adc.join(e, "vec_id")
        .join(F.broadcast(qe), "qid")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("embedding"))
                / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
                6,
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine")
    )
    truth = simsearch_bruteforce_topk.__wrapped__(spark, sf_dir)
    return recall_contract(truth, exact, bound=bound)


@query("simsearch_pq_adc", oracle=RECALL_CONTRACT_SQL)
def simsearch_pq_adc(spark, sf_dir):
    """Product-quantized ANN with asymmetric distance computation (the
    Jegou/Douze/Schmid PQ-ADC design Faiss IndexPQ implements; beyond
    SQ8's 4x, PQ stores 8 int codes per 64-float vector — 32x less
    scan bandwidth, the regime billion-vector search actually runs
    in). Codebooks train on a bounded deterministic sample; ENCODING
    is distributed (`_pq_codes`); SCORING and rerank are the shared
    `_adc_rerank_contract` pipeline (pure JVM scan, exact rerank).
    Driver-checkable recall contract against the brute-force truth,
    like the LSH/IVF/SQ8 queries."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _pq_train(spark, e)
    codes = _pq_codes(spark, e, centroids)
    return _adc_rerank_contract(
        spark, e, codes, centroids, _PQ_RECALL_BOUND, sf_dir=sf_dir
    )


IVFPQ_PROBES = 3  # cells probed per query (matches simsearch_ivf)
#: measured recall@5 vs brute force: 0.54 (sf0.001) / 0.46 (sf0.01) —
#: essentially the IVF cell-probe recall (0.56/0.48): the PQ-ADC
#: ranking inside probed cells loses almost nothing after the 16×k
#: exact rerank, so the composite's recall is governed by the coarse
#: quantizer, exactly the Faiss behavior. Bound 0.3 = the IVF floor;
#: deterministic quantizers mean only a real regression flips it.
_IVFPQ_RECALL_BOUND = 0.3


@query("simsearch_ivfpq", oracle=RECALL_CONTRACT_SQL)
def simsearch_ivfpq(spark, sf_dir):
    """IVF-PQ composite ANN (Faiss IndexIVFPQ — THE billion-scale
    configuration: coarse-quantize to cells, product-quantize the
    RESIDUAL v̂ − centroid): per-query work is |probed cells|/|cells|
    of the corpus AND each candidate costs 8 int-code lookups instead
    of a 64-float dot product — the two savings multiply. ADC scoring
    uses the identity ⟨q̂,v̂⟩ = ⟨q̂,c⟩ + ⟨q̂,r⟩: the per-(query,cell)
    base term and the m×k residual LUT are driver-computed constants
    (O(queries × probes), tiny), the candidate scan is pure JVM
    (F.aggregate over code lookups), encoding is Arrow-batched numpy.
    Top rerank×k ADC candidates re-score with exact float cosine.
    Driver row = recall contract vs the brute-force truth."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from hiveberg_spark.operators.simsearch import (
        _assign_nearest_centroid,
        _label_centroids,
        with_norm,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents_df = _label_centroids(spark, sf_dir)
    cent_rows = cents_df.collect()  # |cells| = 10: tiny
    cent_map = {
        int(r.cell): np.array(r.centroid, dtype=np.float64)
        for r in cent_rows
    }
    assigned = _assign_nearest_centroid(with_norm(e), cents_df)

    # train codebooks on RESIDUALS of the deterministic bounded sample
    sample = (
        assigned.orderBy("vec_id")
        .limit(PQ_TRAIN_CAP)
        .select("embedding", "cell")
        .collect()
    )
    R = np.stack(
        [
            np.array(r.embedding, dtype=np.float64)
            / np.linalg.norm(r.embedding)
            - cent_map[int(r.cell)]
            for r in sample
        ]
    )
    codebooks = _pq_train_matrix(R)
    m, k, d = codebooks.shape
    cb_b = spark.sparkContext.broadcast(codebooks)
    cm_b = spark.sparkContext.broadcast(cent_map)

    @pandas_udf("array<int>")
    def encode(emb: pd.Series, cell: pd.Series) -> pd.Series:
        C = cb_b.value
        cm = cm_b.value
        X = np.stack(emb.to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        X = X - np.stack([cm[int(c)] for c in cell.to_numpy()])
        out = np.zeros((len(X), C.shape[0]), dtype=np.int32)
        sd = C.shape[2]
        for j in range(C.shape[0]):
            sub = X[:, j * sd : (j + 1) * sd]
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * sub @ C[j].T
                + (C[j] ** 2).sum(1)[None, :]
            )
            out[:, j] = d2.argmin(1)
        return pd.Series(list(out))

    codes = assigned.withColumn(
        "codes", encode("embedding", "cell")
    ).select("vec_id", "cell", "codes")

    # per-(query, probed cell) constants: base = <q̂, centroid>, LUT of
    # residual-subspace dot products — O(queries × probes) driver work
    q_rows = e.filter(F.col("vec_id") < _N_QUERIES).orderBy("vec_id").collect()
    cells_sorted = sorted(cent_map)
    lut_rows = []
    for r in q_rows:
        qv = np.array(r.embedding, dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        scores = sorted(
            ((float(qv @ cent_map[c]), c) for c in cells_sorted),
            key=lambda t: (-t[0], t[1]),
        )
        for base, c in scores[:IVFPQ_PROBES]:
            lut = np.zeros(m * k)
            for j in range(m):
                lut[j * k : (j + 1) * k] = (
                    codebooks[j] @ qv[j * d : (j + 1) * d]
                )
            lut_rows.append((r.vec_id, int(c), base, [float(x) for x in lut]))
    luts = spark.createDataFrame(
        lut_rows, "qid long, cell int, base double, lut array<double>"
    )

    adc = (
        codes.join(F.broadcast(luts), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "adc",
            F.col("base")
            + F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    "lut",
                    (j * k + F.element_at("codes", j + 1) + 1).cast("int"),
                ),
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(
                    F.col("adc").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= PQ_RERANK * TOP_K)
        .select("qid", "vec_id")
    )
    qe = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = (
        adc.join(e, "vec_id")
        .join(F.broadcast(qe), "qid")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("embedding"))
                / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
                6,
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine")
    )
    truth = simsearch_bruteforce_topk.__wrapped__(spark, sf_dir)
    return recall_contract(truth, exact, bound=_IVFPQ_RECALL_BOUND)


#: measured recall@5 vs brute force: 0.86 (sf0.001) / 0.86 (sf0.01) —
#: vs plain PQ's 0.96/0.82: the balanced rotation trades a little
#: easy-regime recall for a flatter curve as distractors grow (its
#: whole point on anisotropic corpora). Bound 0.6 = the PQ floor;
#: everything (eigh + sign pinning, greedy allocation, Lloyd) is
#: deterministic, so only a real regression flips it.
_OPQ_RECALL_BOUND = 0.6


def _opq_rotation(X):
    """Parametric (non-iterative) OPQ rotation — Ge et al. 2013, CVPR,
    §4 "OPQ-P": rotate into the PCA eigenbasis, then allocate
    eigen-dimensions to the M subspaces greedily balancing each
    subspace's VARIANCE PRODUCT (log-sum), so no codebook wastes its k
    centroids on a near-zero-variance subspace while another drowns.
    Deterministic: eigh of a fixed covariance with per-column sign
    pinning (largest-magnitude component made positive)."""
    import numpy as np

    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    for c in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[i, c] < 0:
            evecs[:, c] = -evecs[:, c]
    d = X.shape[1]
    sd = d // PQ_M
    buckets: list[list[int]] = [[] for _ in range(PQ_M)]
    loads = [0.0] * PQ_M
    for i in range(d):
        open_b = [j for j in range(PQ_M) if len(buckets[j]) < sd]
        j = min(open_b, key=lambda jj: (loads[jj], jj))
        buckets[j].append(i)
        loads[j] += float(np.log(max(float(evals[i]), 1e-12)))
    perm = [i for b in buckets for i in b]
    return evecs[:, perm]


@query("simsearch_opq_rerank", oracle=RECALL_CONTRACT_SQL)
def simsearch_opq_rerank(spark, sf_dir):
    """OPTIMIZED product quantization (OPQ — Ge et al. 2013; Faiss
    IndexPreTransform(OPQMatrix) + IndexPQ): learn a rotation that
    balances variance across the PQ subspaces BEFORE encoding, so the
    codebooks quantize equally-informative subvectors — the standard
    fix for PQ's weakness on anisotropic embeddings (and real text
    embeddings are strongly anisotropic — the cone `embedding_pca_power`
    measures). Training composes the house pieces: PCA eigenbasis +
    balanced allocation on the same bounded deterministic sample PQ
    trains on; codebooks then Lloyd-train on ROTATED sample vectors.
    Encoding/scan/rerank are the exact `simsearch_pq_adc` pipeline with
    the rotation applied at both encode and query-LUT time (cosine
    rerank needs no rotation — rotations preserve it). Same recall
    contract as every ANN query."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = (
        e.orderBy("vec_id").limit(PQ_TRAIN_CAP).select("embedding").collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    R = _opq_rotation(X)
    centroids = _pq_train_matrix(X @ R)
    codes = _pq_codes(spark, e, centroids, R=R)
    return _adc_rerank_contract(
        spark, e, codes, centroids, _OPQ_RECALL_BOUND, sf_dir=sf_dir, R=R
    )


# -- 1-bit (binary sign) quantization + Hamming prefilter (round 9) -----------

_BIN_RERANK = 16  # hamming-prefiltered candidates per query = factor x k

# Measured recall@5 of the sign-bit prefilter with the 16xk rerank:
# 0.92 (sf0.001) / 0.80 (sf0.01, the driver's gate) — 1-bit codes keep
# less ranking signal than SQ8 but more than enough for a rerank tier.
# Bound 0.6 sits under both; the quantizer has zero trained state (a
# sign test), so only a real regression flips the contract row.
_BIN_RECALL_BOUND = 0.6


def _sign_pack(offset: int) -> "F.Column":
    """Pack 32 sign bits of `embedding` dims [offset, offset+32) into a
    non-negative BIGINT (two 32-bit halves per 64-dim vector: bit 63 of
    a single-long pack would need 2^63, overflowing BIGINT in engines
    that check)."""
    return F.expr(
        "aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
        f"IF(element_at(embedding, i + {offset + 1}) > 0, "
        "shiftleft(1L, i), 0L))"
    )


def binary_hamming_topk(spark, sf_dir):
    """Binary-quantized search with exact rerank: 1 bit per dimension
    (sign test — embeddings are zero-centered), 8 bytes per vector in
    two packed 32-bit halves, corpus scanned with XOR+POPCOUNT hamming
    distance, top RERANK x k per query re-scored with exact float
    cosine. This is the 32x-compression binary-embeddings serving path
    (the RAM-resident rescoring tier production vector stores put in
    front of full-precision disk reads): at 100 TB the hamming pass
    reads 8 B/vector instead of 256 and costs 2 xor+popcount instead of
    64 FMA. Output schema matches simsearch_bruteforce_topk."""
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        "embedding",
        _sign_pack(0).alias("b0"),
        _sign_pack(32).alias("b1"),
    )
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("b0").alias("q0"),
        F.col("b1").alias("q1"),
    )
    approx = coded.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        "qv",
        "embedding",
        F.expr("bit_count(b0 ^ q0) + bit_count(b1 ^ q1)").alias("hamming"),
    )
    wq = W.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("vec_id"))
    survivors = approx.withColumn("crn", F.row_number().over(wq)).filter(
        F.col("crn") <= TOP_K * _BIN_RERANK
    )
    exact = survivors.select(
        "qid",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine")
    )


@query("simsearch_binary_hamming", oracle=RECALL_CONTRACT_SQL)
def simsearch_binary_hamming(spark, sf_dir):
    """Binary (sign-bit) quantization search as a driver-checked recall
    contract: the pack -> hamming-scan -> exact-rerank pipeline
    (binary_hamming_topk) measured against the exact baseline, one
    pinned row."""
    return recall_contract(
        simsearch_bruteforce_topk(spark, sf_dir),
        binary_hamming_topk(spark, sf_dir),
        _BIN_RECALL_BOUND,
    )
