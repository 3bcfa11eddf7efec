"""Operator inventory (SURVEY.md §2). Importing this package registers
every query in `hiveberg_spark.registry`.

REGISTRATION ORDER IS THE DRIVER'S CORRECTNESS WINDOW (VERDICT r1 #1):
the driver hard-checks the first 50 registered queries per round.
Round 1 verified the relational core (filters/joins/aggs/windows/
set-ops/q1-q18 — all green in CORRECTNESS_r01.json), so round 2 rotates
the previously-unchecked signature & extension operators to the front:

  position  1-12  timetravel      (§2.7 — the reference's raison d'être)
  position 13-17  dedup           (§2.11)
  position 18-24  simsearch       (§2.11)
  position 25-33  text_analysis   (§2.11)
  position 34-40  streaming_ops   (§2.9)
  position 41-45  udfs            (§2.10)
  position 46-48  multimodal      (§2.11)
  position 49-50  sketches        (§2.4 approx, tolerance contracts)

Round 3 (current): ordering is now explicit — `registry.DRIVER_WINDOW`
lists the 50 queries in the round-3 window (the 56 never-driver-checked
queries minus 6 deferred to round 4: simsearch_sq8_rerank [rows-only],
stream_snapshot_table_source, text_redact_numbers, doc_chunking,
sample_per_stratum_cap, sample_stratified_split).
`__spark_entry__.queries()` re-keys the registry through
`registry.window_ordered`, so module import order below no longer
determines the window.  New round-3 queries register after the
deferred block and enter round 4's window.
"""

from hiveberg_spark.operators import (  # noqa: F401
    timetravel,
    dedup,
    simsearch,
    text_analysis,
    streaming_ops,
    udfs,
    multimodal,
    sketches,
    pipeline_ops,
    quantization,
    sql_surface,
    snapshot_stream,
    subqueries,
    tpch_extra,
    formats,
    scalar_funcs,
    relational,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    facade,
)
