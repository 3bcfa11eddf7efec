"""The pure-Python Spark-compatible XXH64 (planning-time literal
probes): exact parity with Spark's `xxhash64` expression across every
supported type, and the self-check/fallback contract."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from hiveberg_spark.sources import xxh64
from hiveberg_spark.sources.snapshot_table import SnapshotTable


def test_parity_with_spark_across_types_and_values(spark):
    rng = random.Random(0xA11CE)
    probes: list[tuple[object, str]] = []
    for _ in range(40):
        probes.append((rng.randint(-(2**31), 2**31 - 1), "int"))
        probes.append((rng.randint(-(2**63), 2**63 - 1), "bigint"))
        probes.append(
            ("".join(rng.choice("abcxyz 0123") for _ in range(rng.randint(0, 70))), "string")
        )
        probes.append((rng.uniform(-1e6, 1e6), "double"))
        probes.append((rng.uniform(-100, 100), "float"))
    probes += [(0, "int"), (0, "bigint"), ("", "string"), (0.0, "double"),
               (-0.0, "double"), (True, "boolean"), (False, "boolean")]
    cols = [
        F.xxhash64(F.lit(v).cast(t)).alias(f"h{i}")
        for i, (v, t) in enumerate(probes)
    ]
    row = spark.range(1).select(*cols).head()
    for i, (v, t) in enumerate(probes):
        # floats round-trip through float32 on the python side, exactly
        # as the cast does on the Spark side
        assert row[f"h{i}"] == xxh64.xxhash64_chain([(v, t)]), (v, t)


def test_chain_parity_with_seed_arg(spark):
    vals = [(7, "bigint"), ("probe", "string"), (3.5, "double")]
    for v, t in vals:
        for i in range(4):
            got = spark.range(1).select(
                F.xxhash64(F.lit(v).cast(t), F.lit(i)).alias("h")
            ).head().h
            assert got == xxh64.xxhash64_chain([(v, t), (i, "int")])


def test_self_check_passes_here(spark):
    assert xxh64.self_check(spark) is True


def test_fast_path_equals_job_path_on_table_probes(spark, tmp_path, monkeypatch):
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "hp"))
    t.append(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "id long, data string"
        )
    )
    fast_id = t._hash_of_literal("id", 2)
    fast_s = t._hash_of_literal("data", "beta")
    fast_bloom = t._bloom_hashes_of_literal("id", 2)
    # force the job path on a fresh handle and compare
    t2 = SnapshotTable(spark, t.location)
    monkeypatch.setattr(xxh64, "_SELF_CHECK_RESULT", False)
    assert t2._hash_of_literal("id", 2) == fast_id
    assert t2._hash_of_literal("data", "beta") == fast_s
    assert t2._bloom_hashes_of_literal("id", 2) == fast_bloom


def test_unsupported_shapes_fall_back(spark, tmp_path):
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "fb"))
    t.append(spark.createDataFrame([(1, "a")], "id int, data string"))
    # out-of-int-range literal would wrap under the cast: no fast path
    assert t._python_hash_args("id", 2**40) is None
    # string literal against a numeric column: no fast path
    assert t._python_hash_args("id", "5") is None
    # the probe itself still answers via the job path
    assert isinstance(t._hash_of_literal("id", 2**40), int)


def test_bloom_prunes_on_string_column(spark, tmp_path):
    # string hashing end to end: bitsets written by Spark expressions,
    # probed by the python port
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "bs"))
    t.set_properties({"write.metadata.bloom-filter-columns": "data"})
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(v, f"w{v}") for v in range(30) if v % 3 == i],
                "id long, data string",
            ).coalesce(1)
        )
    assert len(t.plan_files("data = 'w14'")) == 1
    assert t.scan_where("data = 'w14'").count() == 1
    assert t.plan_files("data = 'nope'") == []


def test_vectorized_lanes_match_scalar():
    """The numpy-vectorized int/long lanes (facade partitioned writes)
    must agree bit-for-bit with the scalar lanes the self_check pins
    against Spark — including negative values and type boundaries."""
    import numpy as np

    from hiveberg_spark.sources import xxh64 as xx

    rng = np.random.default_rng(7)
    ints = np.concatenate(
        [
            np.array([0, 1, -1, -7, 2**31 - 1, -(2**31)], dtype=np.int64),
            rng.integers(-(2**31), 2**31, 1000, dtype=np.int64),
        ]
    )
    vec = xx.to_signed_vec(xx.hash_int_vec(ints, 42))
    assert list(vec) == [xx._to_signed(xx.hash_int(int(v), 42)) for v in ints]
    longs = np.concatenate(
        [
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
            rng.integers(-(2**63), 2**63 - 1, 1000, dtype=np.int64),
        ]
    )
    vec = xx.to_signed_vec(xx.hash_long_vec(longs, 42))
    assert list(vec) == [
        xx._to_signed(xx.hash_long(int(v), 42)) for v in longs
    ]
