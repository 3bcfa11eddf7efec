"""Central query registry wiring operators to the driver contract.

Every implemented operator from SURVEY.md §2 registers here with a
`(spark, sf_dir) -> DataFrame` callable and (when SQL-expressible) a
DuckDB oracle SQL string. `__spark_entry__.py` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under `name`, optionally with DuckDB oracle SQL.

    Column names of the Spark result and the oracle must match exactly —
    the driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver may pass its own session — apply the runtime
            # confs every operator depends on (nanosAsLong, ANSI off, UTC)
            from hiveberg_spark.session import ensure_runtime_conf

            return fn(ensure_runtime_conf(spark), sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every operator module so its registrations run."""
    import hiveberg_spark.operators  # noqa: F401
