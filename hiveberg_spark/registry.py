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


# The grading driver hard-checks the FIRST 50 entries of
# ``__spark_entry__.queries()`` per round. Round 6's window was 50/50
# green (CORRECTNESS_r06). Round 7's window (VERDICT r6 #1) is EXACTLY
# 50 names, composed of:
# (a) the 42 round-6 additions that landed after the r6 window froze
#     and have never had a driver CORRECTNESS row — the entire pyds
#     facade family, merge-into clause variants, retrieval stack
#     (BM25/RRF/MMR/RM3), events/pipeline extensions, SHOW PARTITIONS —
#     MINUS the two retired quadratic graph queries (below), PLUS the
#     three queries that replace them;
# (b) VERDICT r6 #2: `simsearch_knn_graph` and `graph_pagerank_knn`
#     registered an all-pairs O(n^2) self-join as the operator data
#     path; both are RETIRED and replaced by IVF-cell-blocked variants
#     (`simsearch_knn_graph_blocked`, `graph_pagerank_blocked` — both
#     full value-hash-checked because the label-centroid quantizer is
#     SQL-expressible) plus the `simsearch_knn_graph_recall` contract
#     row that confines the exact all-pairs truth to oracle scope.
#     `sample_kcenter_coreset` kept its name: the fix (Gonzalez O(n*k))
#     is output-identical, so it re-checks in place;
# (c) round-7 churn + rotation re-checks: the DML family displaced
#     since r5 (delete/update/merge/sql_dml), q1 (oldest driver row),
#     dedup_simhash (parameter study this round, VERDICT r6 #7), and
#     q18 (the r6 timing watch item, VERDICT r6 #5).
DRIVER_WINDOW: list[str] = [
    # (a) never driver-checked — the facade family leads (new API surface)
    "pyds_facade_scan",
    "pyds_lineage_scan",
    "pyds_facade_write",
    "pyds_partitioned_write",
    "stream_pyds_source",
    "stream_pyds_sink",
    "pyds_incremental_read",
    # DML correctness next
    "snapshot_merge_into_clauses",
    "snapshot_merge_nmbs",
    "snapshot_value_index_freshness",
    # dedup / text / events / pipeline extensions
    "dedup_cluster_components",
    "dedup_semdedup",
    "text_hashed_classifier",
    "text_pii_scrub",
    "events_transition_matrix",
    "sample_perplexity_split",
    "multimodal_ahash",
    "scalar_variant_funcs",
    "dedup_substring_spans",
    "pipeline_observed_metrics",
    "stream_observed_metrics",
    "snapshot_write_distribution",
    "udtf_word_runs",
    "snapshot_runtime_prune",
    "snapshot_summary_totals",
    "snapshot_plan_maintenance",
    "events_top_paths",
    "snapshot_widen_date_ts",
    "sample_kcenter_coreset",
    "events_rolling_actives",
    "agg_numeric_histogram",
    # retrieval stack
    "text_bm25_topk",
    "hybrid_rrf_retrieval",
    "simsearch_mmr_rerank",
    "text_rm3_expansion",
    "events_anomaly_zscore",
    "timetravel_incremental_by_time",
    "snapshot_show_partitions",
    "text_perplexity_proxy",
    "q4_order_priority",
    # (b) de-quadratified graph trio replacements (round 7)
    "simsearch_knn_graph_blocked",
    "graph_pagerank_blocked",
    "simsearch_knn_graph_recall",
    # (c) churn + rotation re-checks
    "snapshot_delete_where",
    "snapshot_update_where",
    "snapshot_merge_upsert",
    "snapshot_sql_dml",
    "q1_pricing_summary",
    "dedup_simhash",
    # round-7 addition: the MOR/DV bench split's new build half
    # (VERDICT r6 #3). q18's VERDICT item is a TIMING watch — bench.py
    # re-measures it; its correctness row (green r1) needs no slot.
    "snapshot_mor_dv_build_bench",
]

# Positions 51+ — re-checks that cede their round-7 slot (all green in
# earlier driver rounds AND in local oracle parity at sf0.001+sf0.01);
# they lead round 8's rotation.
DEFERRED_TO_NEXT_WINDOW: list[str] = [
    # round-7 additions that landed after the window was composed —
    # lead round 8 (locally oracle-checked at sf0.001 + sf0.01)
    "cluster_kmeans_refine",
    "embedding_outlier_zscore",
    "embedding_pca_power",
    "embedding_whiten_abtt",
    "simsearch_ivf_persisted",
    "simsearch_ivf_incremental",
    "stream_ivf_refresh",
    "snapshot_metadata_columns",
    "events_attribution_touch",
    "events_attribution_linear",
    "timetravel_where_shim",
    "timetravel_as_of_1",
    "timetravel_current",
    "snapshots_metadata_table",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "filter_eq",
    "filter_bool_tree",
    "projection_pushdown",
    "join_inner_equi",
    "join_left_anti",
    "join_salted_skew",
    "agg_basic_stats",
    "agg_rollup",
    "window_ranking",
    "window_range_frame",
    "limit_topk",
    "set_except",
    "distinct_dropdup",
]


def window_ordered(mapping: dict[str, object]) -> dict[str, object]:
    """Return `mapping` re-keyed so DRIVER_WINDOW names come first
    (window order), then DEFERRED_TO_NEXT_WINDOW, then the rest in
    registration order."""
    out: dict[str, object] = {}
    for name in list(DRIVER_WINDOW) + list(DEFERRED_TO_NEXT_WINDOW):
        if name in mapping:
            out[name] = mapping[name]
    for name, val in mapping.items():
        if name not in out:
            out[name] = val
    return out
