#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count or collect of a bounded
result) — never a driver-side materialization of raw data.

Since round 14 each query's recorded second is the MEDIAN of
$SPARK_GRAFT_BENCH_RUNS (default 3) back-to-back runs, with every raw
sample kept in the `samples` field — the wobble-resistance fix VERDICT
r13 asked for (single-shot numbers spread ±10-30% on identical trees).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hiveberg_spark import registry  # noqa: E402
from hiveberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: scan-heavy agg, multi-join, window, dedup (LSH), simsearch,
# text pass, streaming window — one per operator family
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q16_supplier_cnt_excl",
    "q18_large_volume_customer",
    "window_ranking",
    "agg_count_distinct",
    "batch_sessionize",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simsearch_bruteforce_topk",
    "simsearch_ivf",
    "text_quality_score",
    "stream_tumbling_counts",
    # round 5: the snapshot layer's lifecycle (partitioned append +
    # bucket-pruned COW delete + pruned scan + time travel) — the
    # repo's largest module previously had no bench coverage
    "snapshot_lifecycle_bench",
    # round 7 (VERDICT r6 #3): the MOR fixture BUILD and the MOR/DV
    # READ as separate entries — build first (fresh table: append +
    # position-delete gen + deletion-vector gen), then the read bench
    # reuses the session-cached fixture so its number is the
    # position-file + DV anti-join scan alone
    "snapshot_mor_dv_build_bench",
    "snapshot_mor_dv_read_bench",
    # round 5: the composed training-data pipeline (decontaminate →
    # dedup → quality → split → cap → accounting) as one Catalyst DAG
    "pipeline_corpus_build",
    # round 6: the Python Data Source facade read path (plan-time
    # manifest pruning + executor-side Arrow reads over a MOR-deleted,
    # renamed, defaulted table) — tracks the facade's overhead vs the
    # JVM scan path round-over-round
    "pyds_facade_scan",
    # round 6 (second session): exact-substring span dedup — one
    # fixed-width-key shuffle over every L-token window in the corpus,
    # the heaviest text-dedup primitive (Lee et al. ExactSubstr shape)
    "dedup_substring_spans",
    # round 6 (second session): runtime join filtering — dim-key IN
    # pushdown through bucket + min/max pruning; tracks planner cost +
    # the pruned-scan read path round-over-round
    "snapshot_runtime_prune",
    # round 8: directional containment dedup — the inverted-index
    # intersection pass scoring BOTH directions of every candidate
    # (the subset-duplication detector); tracks the shared capped-index
    # machinery at a second workload shape
    "dedup_containment",
    # round 8: BM25 served from the persisted term-bucketed postings
    # index (first run pays the one-time build into the session
    # warehouse; subsequent runs are the serve path alone — the number
    # tracks stored-index query cost round-over-round)
    "text_bm25_persisted",
    # round 9: the binary (1-bit sign) quantization serve path —
    # 8 B/vector hamming scan + exact rerank; the cheap tier of the
    # quantization ladder the bench already tracks at SQ8/PQ/IVF
    "simsearch_binary_hamming",
    # round 9: winnowing fingerprints — per-position running-min window
    # over exploded k-gram hashes, the windowed-text shape no other
    # headline entry exercises
    "text_winnowing",
    # round 9: Kneser-Ney bigram LM — five count tables from one token
    # pass joined back per token; the heaviest text-LM join shape
    "text_kneser_ney_bigram",
    # round 10: DSIR importance weighting + the two-phase distributed
    # rank/threshold selection (global_positions) that replaced the
    # full-corpus single-task window — tracks the repo's standard
    # ROW_NUMBER replacement at bench scale
    "sample_dsir_weights",
    # round 10 (second session): RFM quintiles — THREE global_positions
    # range-rank passes over the user frame plus two user-keyed joins;
    # tracks the distributed total-order machinery under composition
    "events_rfm_segmentation",
    # round 10 (second session): mutual-kNN triangle kernel — the
    # heaviest new graph path (IVF-blocked edges, persisted once, two
    # node-keyed equi-joins)
    "graph_triangle_count",
    # round 12 (VERDICT r11 #8): the round-11 dedup_incremental_snapshot
    # entry split into BUILD and SERVE trackers, mirroring
    # snapshot_mor_dv_{build,read}_bench — the build writes the three
    # state tables fresh (commit-protocol + state-write cost), then the
    # serve entry times the steady-state incremental path (scan_changes
    # refresh + candidate join + set-equality audits) against the warm
    # fixture the build just wrote, so a serve regression can't hide
    # under fixture-build variance
    "dedup_incremental_build_bench",
    "dedup_incremental_serve_bench",
    # round 11: documents→embeddings backfill — anti-join coverage gap,
    # featurize O(missing), snapshot append + audit
    "pipeline_embedding_backfill",
    # round 13: prefix-filtering exact-Jaccard (the second candidate
    # kernel vs dedup_ngram_jaccard's inverted index — same verified
    # output, different blocking; tracking both keeps the cheaper
    # scheme honest about its candidate volume round-over-round)
    "dedup_jaccard_prefix_filter",
]


def _bench_fns():
    """Resolve each headline name to its benchmark workload. Almost all
    come straight from the registry; `simsearch_ivf` is pinned to the
    pure ANN pipeline (ivf_topk, 50 rows) because the registered query
    became a recall CONTRACT in round 5 (it additionally runs the
    brute-force baseline — a correctness harness, not the workload this
    bench has tracked since round 1)."""
    from hiveberg_spark.operators.quantization import binary_hamming_topk
    from hiveberg_spark.operators.simsearch import ivf_topk

    from hiveberg_spark.operators.dedup import inc_dedup_serve_workload

    fns = {name: registry.QUERIES[name] for name in HEADLINE}
    fns["simsearch_ivf"] = ivf_topk
    # same contract-vs-workload split as simsearch_ivf
    fns["simsearch_binary_hamming"] = binary_hamming_topk
    # serve path WITHOUT the full-corpus rebuild audits (those are the
    # registered contract's correctness harness, not the O(new)
    # steady-state workload this tracker exists to watch)
    fns["dedup_incremental_serve_bench"] = inc_dedup_serve_workload
    return fns


def _previous_rows(sf, here: str | None = None) -> dict[str, int]:
    """Row counts from the most recent BENCH_r*.json at the same SF.

    Round-3 lesson: stream_tumbling_counts dropped 3600 → 10 rows in the
    bench tail and nobody noticed for a full round. Row counts are a free
    correctness signal — diff them against the previous round and shout."""
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    best: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("sf") == sf and isinstance(rec.get("rows"), dict):
                best = rec["rows"]  # later rounds overwrite earlier
        except Exception:
            continue
    return best


def _row_drift(prev_rows: dict[str, int], name: str, n: int) -> str | None:
    """'old -> new' when this query's row count moved vs the previous
    round's recorded bench at the same SF; None when stable or new."""
    if name in prev_rows and prev_rows[name] != n:
        return f"{prev_rows[name]} -> {n}"
    return None


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="hiveberg-spark-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # Warm-up (not counted): run every headline query once at the
    # smallest SF. Schemas are identical across SFs, so this compiles the
    # same whole-stage-codegen classes the timed run uses — the timings
    # then measure steady-state throughput (as on a long-running
    # cluster), not one-time JIT.
    fns = _bench_fns()
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        if os.path.isdir(warm_dir):
            try:
                fns[name](spark, warm_dir).count()
            except Exception as exc:  # warm-up must never fail the bench
                print(f"# warmup {name}: {exc}", file=sys.stderr)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    prev_rows = _previous_rows(sf_val)

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    drift: dict[str, str] = {}
    # Round 14 (VERDICT r13 wrong-#2 / next-#2): one-shot timings in this
    # environment wobble ±10-30% run-to-run (PERF.md documents three calm
    # same-tree runs spreading 1.03-1.31x with a DIFFERENT worst query
    # each time), so a single sample invites false regression flags. Each
    # query now runs N_RUNS times and the recorded number is the MEDIAN;
    # every raw sample is kept in the `samples` side field so the old
    # single-shot methodology remains reconstructable (its run-1 value is
    # samples[name][0]).
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name in HEADLINE:
        fn = fns[name]
        walls = []
        n = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            walls.append(round(time.perf_counter() - t0, 3))
        times[name] = sorted(walls)[len(walls) // 2]  # median
        samples[name] = walls
        rows[name] = n
        d = _row_drift(prev_rows, name, n)
        note = ""
        if d:
            drift[name] = d
            note = (
                f"  *** ROW-COUNT DRIFT vs previous round: "
                f"{d} — INVESTIGATE ***"
            )
        print(
            f"# {name}: median {times[name]:.3f}s of {walls} "
            f"({n} rows){note}",
            file=sys.stderr,
        )

    if drift:
        print(
            "# WARNING: row-count drift detected (a correctness smell, "
            f"not a perf number): {drift}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "samples": samples,
                "rows": rows,
                "row_drift_vs_prev": drift,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
