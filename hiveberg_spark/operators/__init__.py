"""Operator inventory (SURVEY.md §2). Importing this package registers
every query in `hiveberg_spark.registry`."""

from hiveberg_spark.operators import (  # noqa: F401
    relational,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    scalar_funcs,
    subqueries,
    tpch_extra,
    formats,
    udfs,
    timetravel,
    dedup,
    simsearch,
    text_analysis,
    multimodal,
    streaming_ops,
)
