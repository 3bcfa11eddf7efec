"""SQL-string surface extras — registered BEHIND the 50-query window
(round-3 rotation candidates); the DataFrame-API twins of these
capabilities are in the window via the timetravel module."""

from __future__ import annotations

import datetime

from hiveberg_spark.registry import query
from hiveberg_spark.operators.timetravel import (
    _commit_ts,
    _ensure_fixture,
    warehouse_dir,
)


@query(
    "timetravel_sql_version_as_of",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM nation WHERE n_nationkey < 8) AS n_v1,
      (SELECT COUNT(*) FROM nation WHERE n_nationkey < 17) AS n_at_ts,
      (SELECT COUNT(*) FROM nation) AS n_current
    """,
)
def timetravel_sql_version_as_of(spark, sf_dir):
    """SQL-string time travel — `VERSION AS OF n` and
    `FOR SYSTEM_TIME AS OF 'ts'` resolved against the snapshot table
    (Iceberg's SQL surface for the capability the reference drives via
    `WHERE snapshot__id`, IcebergInputFormat.java:100-107; rewriter in
    sources/sql_timetravel.py). Commit timestamps are pinned by the
    fixture, so both clauses are oracle-checkable."""
    from hiveberg_spark.sources.sql_timetravel import sql_with_time_travel

    _ensure_fixture(spark, sf_dir)
    at_ts = datetime.datetime.fromtimestamp(
        (_commit_ts(3) - 1) / 1000, tz=datetime.timezone.utc
    ).isoformat()
    return sql_with_time_travel(
        spark,
        warehouse_dir(sf_dir),
        f"""
        SELECT
          (SELECT COUNT(*) FROM nation_versions VERSION AS OF 1) AS n_v1,
          (SELECT COUNT(*) FROM nation_versions FOR SYSTEM_TIME AS OF '{at_ts}') AS n_at_ts,
          (SELECT COUNT(*) FROM nation_versions VERSION AS OF 3) AS n_current
        """,
    )
