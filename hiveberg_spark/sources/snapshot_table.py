"""Snapshot-table source: an Iceberg-style versioned table on parquet.

This reproduces the reference's signature read-path features natively in
Spark (no Iceberg runtime jar ships in this environment, so the snapshot
layer itself is implemented here — ~the same scope the reference covers
over the Iceberg library):

  - append-only snapshots with parent lineage
      (reference: Iceberg snapshots surfaced via SnapshotIterable.java:37-57)
  - time travel by snapshot id
      (reference: TableScan.useSnapshot from a WHERE-clause virtual-column
       predicate, IcebergInputFormat.java:100-107,288-299)
  - `<name>__snapshots` metadata table by name-suffix convention, with the
    `snapshots.table=false` opt-out
      (reference: TableResolverUtil.java:39-41,72-85,93-100)
  - virtual `snapshot__id` column on every data row, name overridable
      (reference: SystemTableUtil.java:27-58 rebuilds every record to add
       the column; here it is a zero-cost `lit()` — a deliberate
       divergence noted in SURVEY.md §4)
  - empty table (no snapshots) scans as 0 rows, not an error
      (reference: TestInputFormatWithEmptyTable.java:61-79)

Layout:  <location>/data/s<id>/part-*.parquet   (files added by snapshot <id>)
         <location>/metadata.json               (atomic rewrite per commit)

Scale design: a scan materializes NO data through the driver — metadata
holds only file paths; the read is `spark.read.parquet(*files)`, so
predicate/projection pushdown, partition sizing, and vectorized reading
all behave exactly as a plain parquet scan. Snapshot ids are
deterministic (1..N) so results are oracle-checkable.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_VIRTUAL_COLUMN = "snapshot__id"  # SystemTableUtil.java:29
SNAPSHOTS_SUFFIX = "__snapshots"  # TableResolverUtil.java:39

_SNAPSHOT_SCHEMA = (
    "committed_at long, snapshot_id long, parent_id long, "
    "operation string, manifest_list string, summary map<string,string>"
)


class SnapshotTable:
    """A versioned parquet table with Iceberg-style snapshot semantics."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location

    # -- metadata ---------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.location, "metadata.json")

    def _read_meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)  # atomic commit

    @classmethod
    def create(cls, spark: SparkSession, location: str) -> "SnapshotTable":
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        table = cls(spark, location)
        if not os.path.exists(table._meta_path):
            table._write_meta({"snapshots": [], "current_snapshot_id": None})
        return table

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "SnapshotTable":
        table = cls(spark, location)
        if not os.path.exists(table._meta_path):
            raise FileNotFoundError(f"not a snapshot table: {location}")
        return table

    def exists(self) -> bool:
        return os.path.exists(self._meta_path)

    # -- write path -------------------------------------------------------

    def append(self, df: DataFrame) -> int:
        """Commit `df` as a new snapshot; returns the new snapshot id.

        The reference is read-only (IcebergSerDe.java:77-80 serialize →
        null); Spark gives us the write path for free via
        `df.write.parquet`.
        """
        meta = self._read_meta()
        snap_id = (meta["current_snapshot_id"] or 0) + 1
        data_dir = os.path.join(self.location, "data", f"s{snap_id}")
        df.write.mode("overwrite").parquet(data_dir)
        # location-relative paths: the table stays valid under rename/move
        # (atomic build-then-rename fixtures depend on this)
        files = sorted(
            os.path.join("data", f"s{snap_id}", f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        n_records = int(
            self.spark.read.parquet(data_dir).count()
        )  # metadata-only parquet count
        meta["snapshots"].append(
            {
                "snapshot_id": snap_id,
                "parent_id": meta["current_snapshot_id"],
                "operation": "append",
                "committed_at": int(time.time() * 1000),
                "added_files": files,
                "summary": {
                    "added-data-files": str(len(files)),
                    "added-records": str(n_records),
                },
            }
        )
        meta["current_snapshot_id"] = snap_id
        self._write_meta(meta)
        return snap_id

    # -- read path --------------------------------------------------------

    def _files_as_of(self, snapshot_id: int | None) -> tuple[list[str], int | None]:
        meta = self._read_meta()
        current = meta["current_snapshot_id"]
        if snapshot_id is None:
            snapshot_id = current
        if snapshot_id is None:
            return [], None  # empty table: no snapshots yet
        known = {s["snapshot_id"] for s in meta["snapshots"]}
        if snapshot_id not in known:
            raise ValueError(f"unknown snapshot id {snapshot_id} (have {sorted(known)})")
        files: list[str] = []
        for s in meta["snapshots"]:
            if s["snapshot_id"] <= snapshot_id:
                for f in s["added_files"]:
                    # resolve relative entries against the table location
                    # (absolute entries from older metadata still work)
                    files.append(
                        f if os.path.isabs(f) else os.path.join(self.location, f)
                    )
        return files, snapshot_id

    def scan(
        self,
        snapshot_id: int | None = None,
        virtual_column: str | None = DEFAULT_VIRTUAL_COLUMN,
    ) -> DataFrame:
        """Read the table as of a snapshot (default: current).

        Every row carries the virtual snapshot-id column (parity:
        SystemTableUtil.java:35-49; rename parity:
        TestReadSnapshotTable.java:169-193 via the `virtual_column` arg).
        An empty table yields an empty DataFrame, not an error.
        """
        files, sid = self._files_as_of(snapshot_id)
        if not files:
            empty = self.spark.createDataFrame([], "id long")
            return empty.limit(0)
        df = self.spark.read.parquet(*files)
        if virtual_column:
            df = df.withColumn(virtual_column, F.lit(sid).cast("long"))
        return df

    def scan_changes(
        self,
        from_snapshot: int,
        to_snapshot: int | None = None,
        virtual_column: str | None = DEFAULT_VIRTUAL_COLUMN,
    ) -> DataFrame:
        """Incremental read: rows appended AFTER `from_snapshot` up to and
        including `to_snapshot` (default: current) — the CDC/appends-
        between scan of the underlying Iceberg library
        (TableScan.appendsBetween; not surfaced by the reference's Hive
        layer, but core to the table format's capability set).

        Scale: file-level change capture — only the delta's files are
        read, nothing is diffed."""
        meta = self._read_meta()
        current = meta["current_snapshot_id"]
        if to_snapshot is None:
            to_snapshot = current
        known = {s["snapshot_id"] for s in meta["snapshots"]}
        for sid in (from_snapshot, to_snapshot):
            if sid not in known:
                raise ValueError(f"unknown snapshot id {sid} (have {sorted(known)})")
        files: list[str] = []
        for s in meta["snapshots"]:
            if from_snapshot < s["snapshot_id"] <= to_snapshot:
                for f in s["added_files"]:
                    files.append(
                        f if os.path.isabs(f) else os.path.join(self.location, f)
                    )
        if not files:
            return self.scan(virtual_column=virtual_column).limit(0)
        df = self.spark.read.parquet(*files)
        if virtual_column:
            df = df.withColumn(virtual_column, F.lit(to_snapshot).cast("long"))
        return df

    def snapshots(self) -> DataFrame:
        """The `__snapshots` metadata table (SnapshotIterable.java:48-57):
        (committed_at, snapshot_id, parent_id, operation, manifest_list,
        summary map)."""
        meta = self._read_meta()
        rows = [
            (
                s["committed_at"],
                s["snapshot_id"],
                s["parent_id"],
                s["operation"],
                os.path.join(self.location, "data", f"s{s['snapshot_id']}"),
                s["summary"],
            )
            for s in meta["snapshots"]
        ]
        return self.spark.createDataFrame(rows, _SNAPSHOT_SCHEMA)

    # -- WHERE-clause time-travel shim -------------------------------------

    _SNAP_EQ = re.compile(
        r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*=\s*(?P<id>\d+)\s*$"
    )

    def scan_where(
        self, where: str | None, virtual_column: str = DEFAULT_VIRTUAL_COLUMN
    ) -> DataFrame:
        """Reference UX parity: `WHERE snapshot__id = <id>` selects a
        snapshot (IcebergInputFormat.java:288-299 + README.md:90-99).

        Stricter than the reference by design (SURVEY.md §7): only a
        *top-level conjunct* equality triggers time travel — the
        reference scans every SARG leaf and would honor a `snapshot__id`
        buried under OR/NOT, silently changing semantics. Remaining
        conjuncts are applied as ordinary (pushed-down) filters.
        """
        if not where:
            return self.scan(virtual_column=virtual_column)
        conjuncts = _split_top_level_and(where)
        snap_id, residual = None, []
        for c in conjuncts:
            m = self._SNAP_EQ.match(c)
            if m and m.group("col") == virtual_column and snap_id is None:
                snap_id = int(m.group("id"))
            else:
                residual.append(c)
        df = self.scan(snapshot_id=snap_id, virtual_column=virtual_column)
        for c in residual:
            df = df.filter(F.expr(c))
        return df


def _split_top_level_and(expr: str) -> list[str]:
    """Split on AND at paren depth 0 (case-insensitive), preserving
    everything else verbatim."""
    parts, depth, buf = [], 0, []
    tokens = re.split(r"(\(|\)|\bAND\b|\band\b)", expr)
    for tok in tokens:
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        if tok.upper() == "AND" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(tok)
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def resolve_table(
    spark: SparkSession,
    warehouse: str,
    name: str,
    snapshots_table_enabled: bool = True,
) -> DataFrame:
    """Name-based resolution with the `__snapshots` suffix convention.

    Parity: TableResolverUtil.java:59-100 — a name ending in
    `__snapshots` resolves to the base table's snapshot metadata unless
    opted out (property `iceberg.snapshots.table=false` →
    `snapshots_table_enabled=False`), in which case it resolves to a
    data table literally named with the suffix.
    """
    if snapshots_table_enabled and name.endswith(SNAPSHOTS_SUFFIX):
        base = name[: -len(SNAPSHOTS_SUFFIX)]
        base_loc = os.path.join(warehouse, base)
        if os.path.exists(os.path.join(base_loc, "metadata.json")):
            return SnapshotTable.load(spark, base_loc).snapshots()
    return SnapshotTable.load(spark, os.path.join(warehouse, name)).scan()


def build_once(spark: SparkSession, location: str, builder) -> "SnapshotTable":
    """Build a snapshot-table fixture exactly once, safely under
    concurrent processes: build into a unique scratch dir, atomically
    rename into place; losers discard their build and use the winner's.
    `builder(table)` receives the empty table and appends snapshots."""
    import shutil

    ready = os.path.join(location, "_FIXTURE_READY")
    if os.path.exists(ready):
        return SnapshotTable.load(spark, location)
    build_dir = location + ".build-" + uuid.uuid4().hex[:8]
    table = SnapshotTable.create(spark, build_dir)
    builder(table)
    open(os.path.join(build_dir, "_FIXTURE_READY"), "w").close()
    try:
        os.rename(build_dir, location)
    except OSError:
        shutil.rmtree(build_dir, ignore_errors=True)
    return SnapshotTable.load(spark, location)


def register_sql_views(
    spark: SparkSession, warehouse: str, names: list[str] | None = None
) -> list[str]:
    """Expose snapshot tables to the pure-SQL surface: for each table in
    the warehouse, register `<name>` (current-snapshot scan with the
    virtual column) and `<name>__snapshots` (metadata) as temp views —
    the same two names a reference user queries through HiveSQL
    (README.md:50-57, 83-86). Returns the view names registered."""
    registered = []
    names = names or [
        d
        for d in sorted(os.listdir(warehouse))
        if os.path.exists(os.path.join(warehouse, d, "metadata.json"))
    ]
    for name in names:
        t = SnapshotTable.load(spark, os.path.join(warehouse, name))
        t.scan().createOrReplaceTempView(name)
        t.snapshots().createOrReplaceTempView(name + SNAPSHOTS_SUFFIX)
        registered.extend([name, name + SNAPSHOTS_SUFFIX])
    return registered
