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
            from hiveberg_spark.caching import release_tracked
            from hiveberg_spark.session import ensure_runtime_conf

            # free the PREVIOUS query's tracked caches (its result has
            # been collected by now) so storage memory stays bounded at
            # one query's working set across a long-lived session
            release_tracked()
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
# ``__spark_entry__.queries()`` per round. Round 10's window is EXACTLY
# 50 names (VERDICT r9 #1: zero the never-driver-checked debt):
# (a) ALL 20 round-9 additions that landed after round 9's window
#     filled and have NEVER had a driver CORRECTNESS row — local
#     oracle-parity green at sf0.001 + sf0.01 only;
# (b) re-checks of queries whose CODE changed this round: the three
#     two-phase rank rewrites are in (a) already
#     (pipeline_curriculum_phases, pipeline_length_bucketed_batches) or
#     here (sample_dsir_weights — VERDICT r9 #2), plus text_zipf_rank
#     (TakeOrdered head, #7), the two bigram LMs (guarded prev
#     expression, ADVICE #1), stream_bot_rate_monitor (update output
#     mode, ADVICE #3), pipeline_dedup_cascade_report (empty-corpus
#     guards + unpersist, ADVICE #4), sample_epoch_shuffle (now
#     delegating to global_positions), and join_range_bucketed (avg_gap
#     DECIMAL→DOUBLE — the latent r8-data_card-class drift the new
#     Decimal-strict harness caught) and sample_perplexity_split (per-
#     lang NTILE window -> distributed global_positions rank);
#     events_churn_features (integer cutoff, ADVICE #2) is in (a);
# (c) rotation: the round-2-era tier (stalest remaining rows) fills
#     the last 23 slots.
DRIVER_WINDOW: list[str] = [
    # (a) round-9 additions, never driver-checked
    "pipeline_quality_funnel",
    "embedding_matryoshka_audit",
    "pipeline_shard_manifest",
    "events_churn_features",
    "text_winnowing",
    "sketch_hll_intersection",
    "events_ab_srm_check",
    "agg_mode_deterministic",
    "text_source_distinctive_terms",
    "pipeline_length_bucketed_batches",
    "events_seasonal_anomaly",
    "events_ltv_cohort_curve",
    "agg_higher_moments",
    "scalar_regex_funcs",
    "pipeline_curriculum_phases",
    "events_funnel_windowed",
    "asof_join_tolerance",
    "scalar_struct_funcs",
    "dedup_edit_distance",
    "simsearch_probe_sweep",
    # (b) code-changed re-checks (round-10 fixes)
    "sample_dsir_weights",
    "text_zipf_rank",
    "text_kneser_ney_bigram",
    "text_bigram_perplexity",
    "stream_bot_rate_monitor",
    "pipeline_dedup_cascade_report",
    "sample_epoch_shuffle",
    "join_range_bucketed",
    "sample_perplexity_split",
    # (c) rotation — the round-2-era tier (stalest driver rows)
    "dedup_ngram_jaccard",
    "agg_approx_distinct",
    "dedup_exact",
    "agg_percentile_approx",
    "dedup_exact_survivors",
    "embedding_norms",
    "dedup_embedding_cosine",
    "embedding_centroid_dist",
    "text_token_stats",
    "text_bpe_ish_tokens",
    "text_quality_score",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_rolling_hash",
    "text_tfidf_top_terms",
    "text_word_bigrams",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_sql_registration",
    "applyinpandas_zscore",
    "udtf_mapinarrow",
]

# Positions 51+: new round-10 operators lead round 11's window (never
# driver-checked; each lands here as it is added, verified locally at
# sf0.001 + sf0.01), then the remaining round-2-era rotation.
DEFERRED_TO_NEXT_WINDOW: list[str] = [
    # round-10 additions (never driver-checked; sf0.001 + sf0.01 local
    # parity green) — these lead round 11's window
    "agg_argminmax",
    "agg_ols_regression",
    "window_ntile_buckets",
    "asof_join_nearest",
    "text_oov_rate",
    "pipeline_quality_upsampling",
    "events_ab_power_mde",
    "text_topk_coverage",
    "text_source_kl_drift",
    "stream_late_data_policy",
    "scalar_date_parts_funcs",
    "events_ewma_daily",
    "events_uplift_deciles",
    "text_char_entropy",
    "dedup_cluster_best_quality",
    "reshape_unpivot_melt",
    "sample_nucleus_topmass",
    "events_rfm_segmentation",
    "events_survival_km",
    "events_dau_stickiness",
    "events_inter_arrival_stats",
    "join_interval_overlap",
    "dedup_token_sort_key",
    "subquery_lateral_topn",
    "embedding_hubness_audit",
    "events_pareto_share",
    "events_anomaly_mad",
    "agg_boolean_funcs",
    "text_bigram_entropy_rate",
    "embedding_dim_stats_audit",
    "text_good_turing_mass",
    "text_hashing_trick_collisions",
    "pipeline_shingle_sensitivity",
    "graph_triangle_count",
    "events_new_vs_returning",
    "events_gapfill_linear",
    "events_cusum_changepoint",
    "events_session_duration_stats",
    "events_basket_affinity",
    "events_lag_autocorr",
    "text_source_jaccard_matrix",
    "text_collocation_pmi",
    "events_attribution_window_sweep",
    "sample_neyman_allocation",
    "events_chisq_type_dow",
    "events_value_bands_by_hour",
    "events_power_law_hill",
    "dedup_cluster_size_histogram",
    "dedup_prefix_key",
    "stream_hourly_unique_users",
    "pipeline_quality_token_tradeoff",
    "dedup_minhash_band_sweep",
    # round-10 scale re-writes of non-window queries (keyed-skew windows
    # replaced with two-phase forms; code changed → re-check)
    "sample_per_stratum_cap",
    "sample_temperature_mixture",
    # round-10 late fix: mutual-bit self-join now persists its edge list
    # (one IVF pipeline run instead of two); code changed → re-check
    "simsearch_knn_graph_blocked",
    # remaining round-2-era rotation
    "multimodal_metadata",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
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
