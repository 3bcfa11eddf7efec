"""Session-scoped cache ledger bounding `.persist()` lifetimes.

Several report/composition operators persist a shared frame that is
consumed both by driver-side counts AND by the lazily-returned result
DataFrame, so they cannot unpersist before returning.  Left alone,
those caches accumulate across a long-lived session (one per query
run) and eat storage memory (VERDICT r9 hygiene #3).

`persist_tracked` records every such cache; the registry wrapper calls
`release_tracked` at the START of the next query run — by then the
previous query's result has been collected, so its caches are dead
weight.  Unpersisting is always safe: a consumer that somehow still
holds the frame just recomputes it (Spark semantics), correctness is
untouched.  Net effect: at most ONE query's caches are ever live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for deferred release."""
    df.persist()
    _LIVE.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every tracked cache from earlier query runs."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session torn down / frame already gone — nothing to free
