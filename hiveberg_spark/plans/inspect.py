"""Physical-plan inspection helpers.

The reference's optimizations are scan-level (predicate pushdown,
projection pushdown — README.md:59-65); in Spark those are Catalyst
behaviors we *verify* rather than implement. These helpers read the
formatted physical plan so tests can assert, per operator, that
  - filters reached the parquet scan (PushedFilters),
  - only the needed columns are read (ReadSchema),
  - the hot path stayed inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as df.explain, captured
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (projection pushdown proof)."""
    plan = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # execute THIS dataframe first (collect, not count — count builds a
    # different query execution): under AQE the codegen annotations only
    # appear once this plan is final
    df.collect()
    plan = explain_str(df, "simple")
    if "WholeStageCodegen" not in plan and "*(" not in plan:
        raise AssertionError(f"no WholeStageCodegen span in plan:\n{plan}")


#: child node patterns under which an `Exchange SinglePartition` is a
#: bounded funnel, not a full-data one:
#:  - ungrouped aggregates (keys=[]) — one row per upstream partition
#:  - the `global_positions` offsets aggregate (keys=[_pid...]) — one
#:    row per partition by construction
#:  - limits / top-k — bounded by the limit constant
_SP_BOUNDED_CHILD = (
    "HashAggregate(keys=[]",
    "SortAggregate(key=[]",
    "SortAggregate(keys=[]",
    "ObjectHashAggregate(keys=[]",
    "HashAggregate(keys=[_pid",
    "HashAggregate(keys=[pid",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def single_partition_offenders(df: DataFrame) -> list[str]:
    """Every `Exchange SinglePartition` in the physical plan whose input
    is NOT provably bounded (see `_SP_BOUNDED_CHILD`) — i.e. a potential
    full-data funnel through one task, the #1 scale anti-pattern a
    100 TB plan must not contain.  Tree text prints depth-first, so an
    exchange's single child is always the next line."""
    plan = explain_str(df, "simple")
    lines = plan.splitlines()
    out: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        if "ReusedExchange" in ln:
            # a reuse POINTER to an exchange audited at its definition
            # site — the reused node's own line names the original
            continue
        child = lines[i + 1].strip() if i + 1 < len(lines) else "<none>"
        if not any(tok in child for tok in _SP_BOUNDED_CHILD):
            out.append(f"{ln.strip()}  <-  {child}")
    return out
