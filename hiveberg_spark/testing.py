"""Local differential harness mirroring the driver's DuckDB oracle check.

The driver (per BASELINE.md) runs each `queries()[name]` at sf0.01 and
compares against `oracle_sql()[name]` on row-count + schema +
order-insensitive value-hash with columns sorted by name. This module
reproduces that comparison locally so every operator lands green before
the round gate runs.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from hiveberg_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _normalize_cell(x)) for k, x in v.items()))
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def _type_kind(series: pd.Series) -> str:
    """Canonical type kind of a result column, for driver-hash parity.

    The driver's value-hash is type-sensitive: a Spark BIGINT vs a DuckDB
    HUGEINT (→ float64/object in pandas) hash-differ even when every value
    is numerically identical (CORRECTNESS_r02 `text_corpus_stats`), and a
    Spark DECIMAL vs a DuckDB DOUBLE likewise (CORRECTNESS_r08
    `pipeline_data_card`).  Local compare must therefore flag BOTH
    int-vs-float and Decimal-vs-anything kind drift, while still accepting
    the one coercion both engines share (nullable int → float when nulls
    force it).
    """
    k = series.dtype.kind  # i u f b O M m
    if k == "u":
        return "i"
    if k != "O":
        return k
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, Decimal):
            # Decimal is its OWN kind: the driver's value-hash is
            # type-sensitive and a Spark DECIMAL result hash-differs
            # from a DuckDB DOUBLE oracle even when every value is
            # numerically identical (CORRECTNESS_r08 `pipeline_data_card`
            # shipped red exactly because the old harness folded Decimal
            # into "f" and masked the drift — VERDICT r9 #5). Values are
            # still normalized Decimal→float for the ROW comparison, but
            # only after BOTH sides proved to be Decimal.
            return "d"
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            return "f"
        if isinstance(v, str):
            return "s"
        return "O"
    return "?"  # all-null: kind unknowable, accept either side


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    for col in sorted(sp.columns):
        ka, kb = _type_kind(sp[col]), _type_kind(oracle_df[col])
        if ka == kb or "?" in (ka, kb):
            continue
        # nullable-int → float64 coercion happens on whichever side holds
        # nulls; only that asymmetric shape is tolerated, and only when
        # nulls are actually present.
        if {ka, kb} == {"i", "f"} and (
            sp[col].isna().any() or oracle_df[col].isna().any()
        ):
            continue
        problems.append(f"dtype: col {col!r} spark kind={ka} oracle kind={kb}")
    if problems:
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"rowcount: spark={len(sp)} oracle={len(oracle_df)}")
        return problems
    a, b = _canon(sp), _canon(oracle_df)
    n_bad = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra == rb:
            continue
        if float_tol and len(ra) == len(rb):
            ok = all(
                (
                    x == y
                    or (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and abs(x - y) <= float_tol * max(1.0, abs(x), abs(y))
                    )
                )
                for x, y in zip(ra, rb)
            )
            if ok:
                continue
        n_bad += 1
        if n_bad <= 5:
            problems.append(f"row {i}: spark={ra!r} oracle={rb!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
