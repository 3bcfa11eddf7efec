"""Registry-wide all-pairs join sweep (VERDICT r10 #2): every
registered query's physical plan is audited for a nested-loop or
cartesian join where TWO OR MORE child subtrees are unbounded
data-scaling scans (`hiveberg_spark.plans.all_pairs_offenders`) — the
|data|² pair-space anti-pattern that made the old all-pairs
`dedup_embedding_cosine` a 100 TB scale-killer. That query is now the
IVF-blocked pipeline (equi-join on the cell key) and the all-pairs
form is de-registered; this sweep keeps the class out of the registry
the same way tests/test_single_partition_sweep.py keeps out unbounded
single-task funnels.

The allowlist below is PER-NAME with a justification. The classifier
is deliberately conservative: it cannot statically see that a keyed
aggregate (e.g. per-label centroids, per-type sketches) or a
filter-bounded frame (e.g. `vec_id < N_QUERIES`) has catalog/constant
cardinality, so those joins land here with the reason spelled out. A
new data×data nested loop must either fix its plan or earn an entry.

To keep suite time flat, the per-query DataFrame built by
tests/test_single_partition_sweep.py is reused via its module cache.
"""

from __future__ import annotations

import pytest

from hiveberg_spark import registry
from tests.test_single_partition_sweep import cached_offenders

registry.load_all()

#: the corpus × k-centroid (or × codebook) assignment crossJoin of the
#: IVF/PQ family: k is a fixed index parameter (coarse-quantizer cell
#: count), so the nested loop is O(data × k), not O(data²); the PAIR
#: space downstream is an equi-join on the cell key.
_CENTROIDS = "corpus × k-centroid/codebook assignment: k is an index constant"
#: brute-force truth legs and ANN probes join a FILTER-BOUNDED query
#: sample (vec_id < N_QUERIES, a module constant) against the corpus —
#: O(data × #queries) per batch, the documented exact-baseline shape.
_QUERY_SAMPLE = "bounded query sample (vec_id < N_QUERIES) × corpus"

ALLOWED: dict[str, str] = {
    "cluster_kmeans_refine": _CENTROIDS,
    "dedup_blocked_recall": (
        "recall CONTRACT: the exact all-pairs leg IS the ground truth "
        "the blocked path is audited against (certification job on the "
        "contract corpus, not a production data path) + " + _CENTROIDS
    ),
    "dedup_embedding_cosine": (
        _CENTROIDS + "; the near-dup pair space itself is the "
        "cell-key equi-join (round-11 swap, VERDICT r10 #2)"
    ),
    "decontaminate_semantic": (
        _CENTROIDS + " (both sides); the bench × train pair space "
        "itself is the cell-key equi-join"
    ),
    "dedup_semdedup": _CENTROIDS + " (re-planned per component round)",
    "embedding_hubness_audit": _CENTROIDS,
    "embedding_matryoshka_audit": _QUERY_SAMPLE,
    "events_rolling_actives": (
        "28-day rolling range join on the per-DAY activity frame: both "
        "sides calendar-bounded (days of history), never raw events"
    ),
    "graph_pagerank_blocked": _CENTROIDS + " (kNN edge pipeline)",
    "graph_triangle_count": _CENTROIDS + " (kNN edge pipeline)",
    "hybrid_rrf_retrieval": _QUERY_SAMPLE,
    "join_theta_range": (
        "SQL-surface parity op (SURVEY §2.3 theta/range): the naive "
        "non-equi join IS the declared semantics; docstring documents "
        "the perf cliff and points at join_range_bucketed"
    ),
    "simsearch_binary_hamming": _QUERY_SAMPLE,
    "simsearch_bruteforce_topk": _QUERY_SAMPLE,
    "simsearch_filtered_ann": _CENTROIDS,
    "simsearch_ivf": _QUERY_SAMPLE + " (truth leg) + " + _CENTROIDS,
    "simsearch_ivf_persisted": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_ivfpq": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_knn_graph_blocked": _CENTROIDS,
    "simsearch_knn_graph_recall": (
        _QUERY_SAMPLE + " (exact-truth leg of the contract) + " + _CENTROIDS
    ),
    "simsearch_lsh_ann": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_opq_rerank": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_pq_adc": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_probe_sweep": _QUERY_SAMPLE,
    "simsearch_range_lsh": _QUERY_SAMPLE + " + " + _CENTROIDS,
    "simsearch_range_search": _QUERY_SAMPLE,
    "simsearch_sq8_rerank": _QUERY_SAMPLE,
    "sketch_hll_intersection": (
        "type_a < type_b self-join of the PER-EVENT-TYPE sketch frame: "
        "#event-types rows per side, a catalog constant"
    ),
    "stream_ivf_refresh": _CENTROIDS,
}

_ALL = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", _ALL)
def test_no_unbounded_all_pairs_join(spark, sf_dir, name):
    offenders = cached_offenders(spark, sf_dir, name)["all_pairs"]
    if not offenders:
        return
    assert name in ALLOWED, (
        f"{name}: data×data nested-loop/cartesian join in plan "
        f"(fix the plan or allowlist with a justification): {offenders}"
    )
