"""Multimodal columns [N] (SURVEY.md §2.11): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched Pandas UDFs.

The image/audio codecs are not available in this container, so the
*decode* step is a clearly-marked stub (`decode_media` raises
NotImplementedError; `fake_decode_meta` is the deterministic stand-in) —
but all the Spark-side plumbing is real and tested: BinaryType columns,
StructType metadata, mapInPandas batch shapes, and the partition-level
parallelism a 100 TB media pipeline relies on.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


def decode_media(payload: bytes) -> object:
    """Real media decode (PIL/ffmpeg) — STUB: codecs not present in this
    environment. The Spark plumbing around it (binary column → mapInPandas
    → feature columns) is real; swap this function for the codec call in
    production."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode_meta for deterministic tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode_media: derives (width, height,
    codec) from the payload bytes so tests are stable."""
    h = sum(payload[:16])
    return (64 + h % 512, 64 + (h // 7) % 512, ["rgb", "yuv", "gray"][h % 3])


def resize_media(payload: bytes, width: int, height: int) -> bytes:
    """Media resize (PIL/ffmpeg scale) — STUB: codecs not present in this
    environment; `fake_resize_dims` models the dimension math the real
    implementation plugs into."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_resize_dims for deterministic tests"
    )


def fake_resize_dims(
    src_w: int, src_h: int, max_edge: int
) -> tuple[int, int]:
    """Aspect-preserving resize-to-max-edge dimension math (the part of a
    resize that is pure logic)."""
    scale = min(1.0, max_edge / max(src_w, src_h))
    return (max(1, round(src_w * scale)), max(1, round(src_h * scale)))


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS checksum,
           'text/plain' AS mime
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_metadata(spark, sf_dir):
    """Binary payload + typed metadata, computed JVM-side: payload size
    and content checksum — the catalog columns of a media lake. (The
    documents table stands in for a media table; payload = utf-8 bytes.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
        F.lit("text/plain").alias("mime"),
    )


_FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, codec string, "
    "byte_hist array<int>"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: per payload, fake-decode header
    metadata and compute a 16-bin byte histogram (numpy-vectorized within
    the batch — the shape a real image featurizer has)."""
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(buf % 16, minlength=16).astype("int32")
            w, h, codec = fake_decode_meta(bytes(payload))
            out.append((doc_id, len(buf), w, h, codec, hist.tolist()))
        yield pd.DataFrame(
            out, columns=["doc_id", "n_bytes", "width", "height", "codec", "byte_hist"]
        )


def feature_frame(spark, sf_dir):
    """Full featurizer output (doc_id, n_bytes, width, height, codec,
    byte_hist) — used by the registered contract query below and
    bit-exactly validated against a pure-python recompute in
    test_llm_ops.py."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return d.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) AS hist_total,
           TRUE AS meta_ok
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_feature_extract(spark, sf_dir):
    """mapInPandas feature extraction over binary payloads — the sanctioned
    Python path (Arrow batches, vectorized within batch). Scale: purely
    partition-parallel, no shuffle; executor memory bounded by
    maxRecordsPerBatch.

    The checked projection is the featurizer's CONTRACT (decode values
    themselves are python-stub-specific): the 16-bin byte histogram must
    sum exactly to the payload byte count (every byte binned once — this
    fails on any Arrow batch-boundary or dtype bug), and the decoded
    metadata must satisfy the decoder's invariants. Full feature values
    are bit-checked against a pure-python recompute in tests."""
    feats = feature_frame(spark, sf_dir)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.aggregate("byte_hist", F.lit(0), lambda a, x: a + x).alias("hist_total"),
        (
            F.col("width").between(64, 575)
            & F.col("height").between(64, 575)
            & F.col("codec").isin("rgb", "yuv", "gray")
        ).alias("meta_ok"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS frames FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, CAST(UNNEST(generate_series(1, len(frames), 10)) AS INT) - 1 AS frame_idx,
           list_extract(frames, UNNEST(generate_series(1, len(frames), 10))) AS frame
    FROM t
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling pattern: explode every Nth element of a frames
    array (tokens stand in for video frames). JVM-side: sequence with
    step + posexplode — at scale this is the decode-free frame selector
    that runs *before* any expensive per-frame UDF."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    frames = F.split("text", " ")
    idxs = F.sequence(F.lit(0), F.size(frames) - 1, F.lit(10))
    return d.select(
        "doc_id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.cast("int").alias("frame_idx"),
                    F.element_at(frames, i + 1).alias("frame"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.frame_idx", "s.frame")
