"""Pure-Python reimplementation of Spark's `xxhash64` expression for
PLANNING-TIME literal probes (value-index and bloom file-skip pruning).

Why: each pruning probe needs the hash of its literal computed EXACTLY
as the Spark expressions that built the index/bitsets computed it. The
safe way is a 1-row Spark job per literal — correct, but a fixed
~60 ms JVM round trip that dominates point-probe planning locally
(PERF.md, bloom economics). This module removes that cost for the
common literal types while keeping the no-drift guarantee:

- the algorithm is the PUBLIC XXH64 spec as specialized by Spark
  (`sql/catalyst XXH64.java`): `hashInt` for 4-byte types, `hashLong`
  for 8-byte types, streaming XXH64 over UTF-8 bytes for strings;
  multi-argument `xxhash64(a, b)` chains — b is hashed with a's hash
  as the seed (seed starts at 42);
- callers MUST verify once per process via `self_check(spark)` (one
  tiny job hashing pinned values of every supported type) before
  trusting the fast path, and fall back to Spark jobs if it fails —
  a Spark version that changed hashing degrades to the slow-correct
  path instead of mispruning.

Unsupported types (decimal, date/timestamp internals, binary, nested)
report `supported() == False` and callers use the Spark job.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1
_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42  # Spark's XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — 4-byte lane (int/short/byte/float-bits)."""
    h = (seed + _PRIME5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _PRIME1) & _MASK
    h = (_rotl(h, 23) * _PRIME2 + _PRIME3) & _MASK
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — 8-byte lane (long/double-bits)."""
    h = (seed + _PRIME5 + 8) & _MASK
    h ^= (_rotl((value & _MASK) * _PRIME2 & _MASK, 31) * _PRIME1) & _MASK
    h = (_rotl(h, 27) * _PRIME1 + _PRIME4) & _MASK
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark hashUnsafeBytes —
    strings hash their UTF-8 bytes)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _PRIME1) & _MASK
        while i <= length - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            v2 = (_rotl((v2 + k2 * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            v3 = (_rotl((v3 + k3 * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            v4 = (_rotl((v4 + k4 * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            h = (h * _PRIME1 + _PRIME4) & _MASK
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + length) & _MASK
    while i <= length - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
        h = (_rotl(h, 27) * _PRIME1 + _PRIME4) & _MASK
        i += 8
    if i <= length - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _PRIME1) & _MASK
        h = (_rotl(h, 23) * _PRIME2 + _PRIME3) & _MASK
        i += 4
    while i < length:
        h ^= ((data[i] & 0xFF) * _PRIME5) & _MASK
        h = (_rotl(h, 11) * _PRIME1) & _MASK
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _to_unsigned(h: int) -> int:
    return h & _MASK


# -- Spark-typed value hashing ------------------------------------------------

_INT_KINDS = {"tinyint", "smallint", "int"}
_LONG_KINDS = {"bigint"}


def supported(simple_type: str) -> bool:
    return simple_type in _INT_KINDS | _LONG_KINDS | {
        "string", "float", "double", "boolean"
    }


def checked_ok() -> bool:
    """True iff self_check already PASSED in this process — lets
    sessionless callers (facade planning) reuse a prior verification
    without a SparkSession of their own."""
    return _SELF_CHECK_RESULT is True


def hash_typed(value, simple_type: str, seed: int) -> int:
    """Hash one non-null value AS its Spark type (seed and result are
    UNSIGNED here; convert at the boundary). Mirrors Spark's
    HashExpression per-type dispatch; the caller guarantees `value`
    already fits the type (cast semantics applied upstream)."""
    if simple_type in _INT_KINDS:
        return hash_int(int(value), seed)
    if simple_type in _LONG_KINDS:
        return hash_long(int(value), seed)
    if simple_type == "boolean":
        return hash_int(1 if value else 0, seed)
    if simple_type == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    if simple_type == "float":
        f = struct.unpack("<f", struct.pack("<f", float(value)))[0]
        if f == 0.0:
            f = 0.0  # -0.0 normalizes to 0.0 (Spark does the same)
        (bits,) = struct.unpack("<i", struct.pack("<f", f))
        return hash_int(bits, seed)
    if simple_type == "double":
        d = float(value)
        if d == 0.0:
            d = 0.0
        (bits,) = struct.unpack("<q", struct.pack("<d", d))
        return hash_long(bits, seed)
    raise ValueError(f"unsupported type for python xxhash64: {simple_type}")


def xxhash64_chain(values_types: list[tuple[object, str]]) -> int:
    """Spark's multi-argument `xxhash64(a, b, ...)`: each argument is
    hashed with the running result as seed, starting at 42. Returns the
    SIGNED 64-bit value Spark returns. Null arguments leave the running
    seed unchanged (Spark skips nulls)."""
    h = DEFAULT_SEED
    for value, simple_type in values_types:
        if value is None:
            continue
        h = hash_typed(value, simple_type, h & _MASK)
    return _to_signed(h)


_SELF_CHECK_RESULT: bool | None = None

#: pinned probes: one per supported kind, including a >32-byte string
#: (exercises the streaming XXH64 block loop) and negative numerics
_SELF_CHECK_PROBES: list[tuple[object, str]] = [
    (123456789, "int"),
    (-7, "int"),
    (987654321987654321, "bigint"),
    (-1, "bigint"),
    ("spark", "string"),
    ("a longer probe string exercising the 32-byte xxh64 block loop!!", "string"),
    (True, "boolean"),
    (1.5, "float"),
    (-0.0, "float"),
    (2.718281828459045, "double"),
    (-0.0, "double"),
]


def self_check(spark) -> bool:
    """ONE tiny Spark job proving the python path matches Spark for
    every supported type (including two-argument chaining) — cached for
    the process. Callers must consult this before using the fast path;
    False means Spark's hashing changed and the slow-correct job path
    must be used."""
    global _SELF_CHECK_RESULT
    if _SELF_CHECK_RESULT is not None:
        return _SELF_CHECK_RESULT
    from pyspark.sql import functions as F

    cols = []
    for i, (v, t) in enumerate(_SELF_CHECK_PROBES):
        cols.append(F.xxhash64(F.lit(v).cast(t)).alias(f"h{i}"))
        cols.append(
            F.xxhash64(F.lit(v).cast(t), F.lit(i).cast("int")).alias(f"c{i}")
        )
    try:
        row = spark.range(1).select(*cols).head()
        ok = True
        for i, (v, t) in enumerate(_SELF_CHECK_PROBES):
            if row[f"h{i}"] != xxhash64_chain([(v, t)]):
                ok = False
                break
            if row[f"c{i}"] != xxhash64_chain([(v, t), (i, "int")]):
                ok = False
                break
    except Exception:
        ok = False
    _SELF_CHECK_RESULT = ok
    return ok


# -- numpy-vectorized lanes (facade partitioned writes) -----------------------
#
# The facade writer computes bucket-transform partition keys executor-
# side in Arrow batches; a per-row Python hash would be the classic
# 100× cliff, so the two fixed-width lanes vectorize in numpy uint64
# (wrapping C semantics == the & _MASK reductions above). Strings keep
# the scalar path — variable-length XXH64 doesn't vectorize — and the
# same self_check gate governs both.


def _np():
    import numpy as np

    return np


def _rotl_vec(x, r: int):
    np = _np()
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_vec(h):
    np = _np()
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_PRIME2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_PRIME3)
    h = h ^ (h >> np.uint64(32))
    return h


def hash_int_vec(values, seed: int):
    """Vectorized `hash_int` over an int array; returns uint64 array.
    Negative inputs take their two's-complement low 32 bits, exactly
    like `value & 0xFFFFFFFF` in the scalar lane."""
    np = _np()
    v = values.astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h = np.uint64((seed + _PRIME5 + 4) & _MASK) ^ (v * np.uint64(_PRIME1))
    h = _rotl_vec(h, 23) * np.uint64(_PRIME2) + np.uint64(_PRIME3)
    return _fmix_vec(h)


def hash_long_vec(values, seed: int):
    """Vectorized `hash_long` over an int array; returns uint64 array."""
    np = _np()
    v = values.astype(np.int64).astype(np.uint64)
    k = _rotl_vec(v * np.uint64(_PRIME2), 31) * np.uint64(_PRIME1)
    h = np.uint64((seed + _PRIME5 + 8) & _MASK) ^ k
    h = _rotl_vec(h, 27) * np.uint64(_PRIME1) + np.uint64(_PRIME4)
    return _fmix_vec(h)


def to_signed_vec(h):
    """uint64 hash array -> the signed int64 values Spark returns."""
    return h.view(_np().int64) if h.flags["C_CONTIGUOUS"] else h.astype(
        "uint64"
    ).view(_np().int64)
