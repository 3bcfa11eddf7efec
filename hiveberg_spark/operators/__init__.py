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

Round-3 rotation plan: move subqueries, tpch_extra, formats and the
remaining scalar_funcs families into the window (31 queries), backfilled
with the most valuable round-1-green rows for regression coverage.
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
    sql_surface,
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
)
