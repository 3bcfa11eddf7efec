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


#: join node classes whose pair space is |left|×|right| (no equi key)
_AP_JOINS = ("BroadcastNestedLoopJoin", "CartesianProduct")

#: a child subtree containing any of these is treated as bounded —
#: the nested-loop pair space is then O(data × constant), the broadcast
#: pattern the per-op plan tests allowlist (one-row stat frames, grids,
#: catalog literals, limits)
_AP_BOUNDED = (
    "HashAggregate(keys=[]",
    "SortAggregate(key=[]",
    "SortAggregate(keys=[]",
    "ObjectHashAggregate(keys=[]",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "LocalTableScan",
    "Range (",
)

#: scans of catalog-cardinality tables (nation=25, region=5 rows at any
#: SF) — bounded by schema, not by data volume
_AP_SMALL_TABLE_COLS = ("n_nationkey", "r_regionkey")

_NODE_RE = re.compile(r"^([: ]*)[+:]- (.*)$")


def _plan_nodes(plan: str) -> list[tuple[int, str]]:
    """(depth, text) per physical-plan node; tree-drawing prefix length
    is the depth, root lines get depth -3 so depth-0 children nest."""
    nodes: list[tuple[int, str]] = []
    for ln in plan.splitlines():
        m = _NODE_RE.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2)))
        elif ln.strip() and not ln.startswith("=="):
            nodes.append((-3, ln.strip()))
    return nodes


def _subtree_unbounded_data(texts: list[str]) -> bool:
    if any(tok in t for tok in _AP_BOUNDED for t in texts):
        return False
    for t in texts:
        if "Scan" in t and not any(c in t for c in _AP_SMALL_TABLE_COLS):
            return True
    return False


def all_pairs_offenders(df: DataFrame) -> list[str]:
    """Every nested-loop/cartesian join in the physical plan where TWO
    OR MORE child subtrees are unbounded data-scaling scans — i.e. a
    pair space that grows as |data|², the cartesian-product
    scale-killer class (VERDICT r10 #2). Joins against provably bounded
    frames (one-row aggregates, limits, literal grids, nation/region)
    pass; a data×data nested loop must be fixed or allowlisted in
    tests/test_all_pairs_sweep.py with a justification."""
    nodes = _plan_nodes(explain_str(df, "simple"))
    out: list[str] = []
    for i, (d, txt) in enumerate(nodes):
        if not any(j in txt for j in _AP_JOINS):
            continue
        end = i + 1
        while end < len(nodes) and nodes[end][0] > d:
            end += 1
        kids = list(range(i + 1, end))
        if not kids:
            continue
        child_depth = min(nodes[k][0] for k in kids)
        starts = [k for k in kids if nodes[k][0] == child_depth]
        unbounded = 0
        for ci, cstart in enumerate(starts):
            cend = starts[ci + 1] if ci + 1 < len(starts) else end
            if _subtree_unbounded_data([nodes[k][1] for k in range(cstart, cend)]):
                unbounded += 1
        if unbounded >= 2:
            out.append(txt[:120])
    return out


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
