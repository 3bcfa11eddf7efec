"""The bench harness's row-drift guard (VERDICT r4 next #4): BENCH_r04
was the first file with a `rows` field, so round 5 is the first real
cross-round diff — pin the machinery with a seeded change so the drift
path itself can never rot silently."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _write(tmp_path, name, sf, rows):
    with open(os.path.join(tmp_path, name), "w") as f:
        json.dump({"sf": sf, "rows": rows}, f)


def test_previous_rows_picks_latest_round_at_same_sf(tmp_path):
    _write(tmp_path, "BENCH_r03.json", 0.1, {"q1": 6, "stream": 3600})
    _write(tmp_path, "BENCH_r04.json", 0.1, {"q1": 6, "stream": 10})
    _write(tmp_path, "BENCH_r05.json", 0.001, {"q1": 6})  # other SF: ignored
    prev = bench._previous_rows(0.1, here=str(tmp_path))
    assert prev == {"q1": 6, "stream": 10}  # r04 wins over r03; r05 is 0.001


def test_previous_rows_skips_files_without_rows(tmp_path):
    with open(os.path.join(tmp_path, "BENCH_r03.json"), "w") as f:
        json.dump({"sf": 0.1}, f)  # pre-round-4 format: no rows field
    _write(tmp_path, "BENCH_r02.json", 0.1, {"q1": 5})
    assert bench._previous_rows(0.1, here=str(tmp_path)) == {"q1": 5}


def test_previous_rows_empty_when_nothing_matches(tmp_path):
    assert bench._previous_rows(0.1, here=str(tmp_path)) == {}


def test_row_drift_fires_on_seeded_change():
    prev = {"stream_tumbling_counts": 3600, "q1_pricing_summary": 6}
    # the exact round-3 failure mode: a streaming query silently shrank
    assert (
        bench._row_drift(prev, "stream_tumbling_counts", 10) == "3600 -> 10"
    )
    assert bench._row_drift(prev, "q1_pricing_summary", 6) is None
    assert bench._row_drift(prev, "brand_new_query", 42) is None


def test_current_rows_feed_next_rounds_diff(tmp_path):
    """End-to-end shape: a seeded BENCH file's rows diff against a
    simulated current run — every changed query is flagged, stable and
    new ones are not."""
    _write(
        tmp_path, "BENCH_r04.json", 0.1, {"a": 1, "b": 2, "c": 3}
    )
    prev = bench._previous_rows(0.1, here=str(tmp_path))
    current = {"a": 1, "b": 99, "d": 4}
    drift = {
        name: d
        for name, n in current.items()
        if (d := bench._row_drift(prev, name, n))
    }
    assert drift == {"b": "2 -> 99"}
