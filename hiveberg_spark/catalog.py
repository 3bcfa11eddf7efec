"""Table resolution over the driver's parquet fixtures.

Reference parity: TableResolverUtil.java:48-100 resolves tables from a
JobConf (`iceberg.catalog` ∈ {hadoop.tables, hadoop.catalog}) plus the
`__snapshots` name-suffix convention. Here resolution is (sf_dir, name) →
DataFrame; the snapshot/metadata-table surface lives in
`hiveberg_spark.sources.snapshot_table` and reuses the same suffix
convention (`<name>__snapshots`).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    The parquet scan is left untouched so Catalyst keeps full pushdown
    freedom (filters/column pruning reach the parquet reader). The only
    normalization is the events timestamp, whose physical type drifts
    across driver fixture regenerations: current fixtures store
    timestamp[us] (read natively, the guard below is a no-op); older ones
    stored TIMESTAMP(NANOS), which Spark has no type for — under
    `nanosAsLong` that arrives as long nanos and is converted here to a
    microsecond TIMESTAMP_NTZ (matching what DuckDB surfaces).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from hiveberg_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)  # safe under externally-built sessions
    per_session = _PLAN_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is not None:
        return df
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, NOT float division: epoch-nanos exceed 2^53, so a
        # double round-trip would corrupt the low microseconds
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    per_session[key] = df
    return df


# Lazy-PLAN reuse, not result caching (guide §6 file-listing guidance):
# every `spark.read.parquet` call relists the path and runs a
# schema-inference footer job — ~0.15 s of driver time per call, paid
# up to 6x per query for IMMUTABLE fixture tables. The cached object is
# an unexecuted scan plan; every action on it still reads the parquet
# inputs (nothing is persisted/materialized, so bench and oracle runs
# compute from storage every time). Keyed weakly on the session so a
# stopped session's plans are never reused and tests that rebuild
# sessions get fresh listings.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
