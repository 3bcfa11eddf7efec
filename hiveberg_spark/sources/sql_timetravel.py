"""SQL-string time travel: `VERSION AS OF` / `FOR SYSTEM_TIME AS OF`
over snapshot tables (Iceberg's SQL surface; the capability the
reference exposes through `WHERE snapshot__id = n`,
IcebergInputFormat.java:100-107 — here also as the standard SQL form).

Spark's parser supports the clauses only for real catalog tables, so
for path-based snapshot tables this pre-pass rewrites

    ... FROM <table> VERSION AS OF <n> [AS alias] ...
    ... FROM <table> FOR SYSTEM_TIME AS OF '<ts>' [AS alias] ...

into a scan of the resolved snapshot registered as a temp view, then
hands the rewritten SQL to Spark. Deliberately conservative: table
names must be bare identifiers known to the warehouse; anything else is
left untouched for Spark to parse (and error on) itself.
"""

from __future__ import annotations

import datetime
import os
import re

from pyspark.sql import DataFrame, SparkSession

from hiveberg_spark.sources.snapshot_table import SnapshotTable

_VERSION_RE = re.compile(
    r"\b(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)",
    re.IGNORECASE,
)
_TIME_RE = re.compile(
    r"\b(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"'(?P<ts>[^']+)'",
    re.IGNORECASE,
)


def _ts_to_millis(ts: str) -> int:
    dt = datetime.datetime.fromisoformat(ts)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1000)


def sql_with_time_travel(
    spark: SparkSession, warehouse: str, sql: str
) -> DataFrame:
    """Run `sql`, resolving VERSION AS OF / FOR SYSTEM_TIME AS OF
    clauses against snapshot tables in `warehouse`."""

    def _load(name: str) -> SnapshotTable | None:
        loc = os.path.join(warehouse, name)
        if os.path.exists(os.path.join(loc, "metadata.json")):
            return SnapshotTable.load(spark, loc)
        return None

    def sub_version(m: re.Match) -> str:
        t = _load(m.group("table"))
        if t is None:
            return m.group(0)
        view = f"{m.group('table')}__v{m.group('ver')}"
        t.scan(snapshot_id=int(m.group("ver"))).createOrReplaceTempView(view)
        return view

    def sub_time(m: re.Match) -> str:
        t = _load(m.group("table"))
        if t is None:
            return m.group(0)
        millis = _ts_to_millis(m.group("ts"))
        sid = t.snapshot_id_as_of(millis)
        view = f"{m.group('table')}__t{sid}"
        t.scan(snapshot_id=sid).createOrReplaceTempView(view)
        return view

    rewritten = _VERSION_RE.sub(sub_version, sql)
    rewritten = _TIME_RE.sub(sub_time, rewritten)
    return spark.sql(rewritten)
