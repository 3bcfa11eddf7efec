"""Incrementally-maintained materialized aggregates [N] — the
lakehouse "materialized view with incremental refresh" pattern the
table format's incremental read exists to power (Iceberg's
appendsBetween feeding a rollup table; the reference exposes none of
this — its layer is read-only scans, TableResolverUtil.java:59-91 —
but a user of the capability set builds exactly this on top).

The 100 TB shape: `refresh()` reads ONLY the source files appended
since the stored cursor (`scan_changes` — file-level change capture,
no diffing), partially aggregates that delta, and upserts ONLY the
affected group keys into the rollup table via an equality delete +
append (O(delta + affected keys) write cost, never O(source) and never
O(rollup)). Aggregates must be decomposable (count/sum/min/max — avg
derives from sum+count). A DML commit in the refresh range falls back
to the CHANGELOG path (additive merge for insert-only groups, exact
per-group recompute for delete-touched ones — the standard IVM
treatment of non-retractable aggregates), so the view maintains
incrementally across deletes and updates too.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hiveberg_spark.sources.snapshot_table import SnapshotTable

_MERGEABLE = ("count", "sum", "min", "max")

# exact-merge arithmetic for float sources: partials are combined in
# wide decimal so refresh order can never change low bits vs a full
# recompute (the same convention the streaming aggregates use)
_DEC = "decimal(30,6)"


class MaterializedAggregate:
    """A rollup SnapshotTable plus a refresh cursor into its source.

    `agg_specs` maps output column -> (kind, source_expr) with kind in
    count/sum/min/max; `count` ignores its expr (COUNT(*)). The rollup
    table carries one column per spec plus the group keys; every
    version of the rollup is itself time-travelable (it IS a snapshot
    table), so "the view as of yesterday's refresh" is a free query.
    """

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self._state_path = os.path.join(location, "mv_state.json")

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        location: str,
        source: SnapshotTable,
        group_cols: list[str],
        agg_specs: dict[str, tuple[str, str]],
    ) -> "MaterializedAggregate":
        for out, (kind, _) in agg_specs.items():
            if kind not in _MERGEABLE:
                raise ValueError(
                    f"{out}: {kind!r} is not incrementally mergeable "
                    f"(supported: {_MERGEABLE}; derive avg from sum+count)"
                )
        mv = cls(spark, location)
        src_meta = source._read_meta()
        cursor = src_meta["current_snapshot_id"]
        if cursor is None:
            raise ValueError("source table has no snapshot to materialize")
        base = mv._aggregate(source.scan(virtual_column=None), group_cols, agg_specs)
        table = SnapshotTable.create(spark, location, schema=base.schema)
        table.append(base)
        with open(mv._state_path, "w") as f:
            json.dump(
                {
                    "source_location": os.path.abspath(source.location),
                    "group_cols": group_cols,
                    "agg_specs": {k: list(v) for k, v in agg_specs.items()},
                    "cursor": cursor,
                },
                f,
            )
        return mv

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "MaterializedAggregate":
        mv = cls(spark, location)
        if not os.path.exists(mv._state_path):
            raise FileNotFoundError(f"not a materialized aggregate: {location}")
        return mv

    def _state(self) -> dict:
        return json.load(open(self._state_path))

    def table(self) -> SnapshotTable:
        return SnapshotTable.load(self.spark, self.location)

    def read(self) -> DataFrame:
        """Current rollup contents."""
        return self.table().scan(virtual_column=None)

    # -- refresh -----------------------------------------------------------

    def _aggregate(
        self, df: DataFrame, group_cols: list[str], agg_specs: dict
    ) -> DataFrame:
        aggs = []
        for out, (kind, expr) in agg_specs.items():
            col = F.expr(expr) if kind != "count" else None
            if kind == "count":
                aggs.append(F.count(F.lit(1)).alias(out))
            elif kind == "sum":
                # decimal-internal partial so merge order never drifts
                aggs.append(F.sum(col.cast(_DEC)).cast("double").alias(out))
            elif kind == "min":
                aggs.append(F.min(col).alias(out))
            elif kind == "max":
                aggs.append(F.max(col).alias(out))
        return df.groupBy(*group_cols).agg(*aggs)

    def _merge(self, old: DataFrame, delta: DataFrame, state: dict) -> DataFrame:
        """Combine two partial-aggregate frames on the group keys:
        sum/count add, min/max take least/greatest — the standard
        mergeable-aggregate algebra, null-safe on either side."""
        keys = state["group_cols"]
        both = old.unionByName(delta)
        aggs = []
        for out, (kind, _) in state["agg_specs"].items():
            c = F.col(out)
            if kind in ("count",):
                aggs.append(F.sum(c).alias(out))
            elif kind == "sum":
                aggs.append(F.sum(c.cast(_DEC)).cast("double").alias(out))
            elif kind == "min":
                aggs.append(F.min(c).alias(out))
            else:
                aggs.append(F.max(c).alias(out))
        return both.groupBy(*keys).agg(*aggs)

    def refresh(self) -> dict:
        """Incremental refresh: aggregate the source rows appended since
        the cursor and upsert the affected group keys. Returns
        {"from", "to", "updated_keys"}; a no-op when the source has not
        advanced. A range containing DML (scan_changes raises) falls
        back to the CHANGELOG path: additive deltas for insert-only
        groups, exact per-group recompute for delete-touched ones —
        still O(delta + affected groups) rollup writes, never
        O(rollup)."""
        state = self._state()
        prev_cursor = state["cursor"]
        source = SnapshotTable.load(self.spark, state["source_location"])
        src_current = source._read_meta()["current_snapshot_id"]
        if src_current == prev_cursor:
            return {"from": prev_cursor, "to": src_current, "updated_keys": 0}
        try:
            delta_rows = source.scan_changes(
                prev_cursor, src_current, virtual_column=None
            )
        except ValueError:
            return self._refresh_via_changelog(
                state, source, prev_cursor, src_current
            )
        keys = state["group_cols"]
        specs = {k: tuple(v) for k, v in state["agg_specs"].items()}
        delta = self._aggregate(delta_rows, keys, specs).persist()
        try:
            n_keys = delta.count()
            if n_keys:
                table = self.table()
                affected = delta.select(*keys)
                current = table.scan(virtual_column=None).join(
                    affected, keys, "left_semi"
                )
                merged = self._merge(current, delta, state)
                # O(affected keys) write: equality-delete the stale
                # rollup rows, append the merged ones — untouched group
                # keys' files carry by reference
                table.delete_by_keys(affected)
                table.append(merged)
        finally:
            delta.unpersist()
        state["cursor"] = src_current
        with open(self._state_path, "w") as f:
            json.dump(state, f)
        return {"from": prev_cursor, "to": src_current, "updated_keys": n_keys}

    def _refresh_via_changelog(
        self, state: dict, source: SnapshotTable, prev: int, cur: int
    ) -> dict:
        """Incremental maintenance ACROSS DML commits, from the row-level
        changelog: insert-only groups merge additively exactly like the
        append fast path; groups any delete touched are recomputed
        EXACTLY from the source restricted to those keys — min/max
        cannot retract, and a count that reaches zero must drop its
        rollup row, so per-group recompute is the correct (and
        standard) IVM fallback. Rollup write cost stays O(affected
        groups): equality-delete + append, untouched keys carry. The
        recompute READ is a source scan filtered to the affected keys —
        file-skipped by whatever pruning the key column has (partition,
        z-order bounds, bloom index), one pass worst case."""
        keys = state["group_cols"]
        specs = {k: tuple(v) for k, v in state["agg_specs"].items()}
        ch = source.scan_changelog(prev, cur)
        data_cols = [
            c
            for c in ch.columns
            if c not in ("_change_type", "_commit_snapshot_id", "_committed_at")
        ]
        ins = ch.filter(F.col("_change_type") == "insert").select(*data_cols)
        dels = ch.filter(F.col("_change_type") == "delete").select(*data_cols)
        del_keys = dels.select(*keys).distinct().persist()
        # groups no delete touched: pure additive merge of the inserts
        add_delta = (
            self._aggregate(ins, keys, specs)
            .join(del_keys, keys, "left_anti")
            .persist()
        )
        try:
            n_add, n_del = add_delta.count(), del_keys.count()
            if n_add or n_del:
                table = self.table()
                parts: list[DataFrame] = []
                if n_add:
                    current = table.scan(virtual_column=None).join(
                        add_delta.select(*keys), keys, "left_semi"
                    )
                    parts.append(self._merge(current, add_delta, state))
                if n_del:
                    # pinned to the refresh boundary `cur`, NOT the
                    # current head: a commit landing between the
                    # changelog read and this recompute would otherwise
                    # be baked into the rollup now and re-applied
                    # additively on the next refresh — double counting
                    recomputed = self._aggregate(
                        source.scan(
                            snapshot_id=cur, virtual_column=None
                        ).join(del_keys, keys, "left_semi"),
                        keys,
                        specs,
                    )
                    # a group whose rows all vanished yields no
                    # recomputed row — the delete below drops it
                    parts.append(recomputed)
                merged = parts[0]
                for p in parts[1:]:
                    merged = merged.unionByName(p)
                affected = (
                    add_delta.select(*keys)
                    .unionByName(del_keys)
                    .distinct()
                )
                n_keys = affected.count()
                table.delete_by_keys(affected)
                table.append(merged)
            else:
                n_keys = 0
        finally:
            add_delta.unpersist()
            del_keys.unpersist()
        state["cursor"] = cur
        with open(self._state_path, "w") as f:
            json.dump(state, f)
        return {"from": prev, "to": cur, "updated_keys": n_keys}
