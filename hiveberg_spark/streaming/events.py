"""Structured Streaming source over the events table [N].

The reference is batch-only; the north star adds an unbounded events
stream. Locally the parquet fixture is replayed as a file-source stream
(`availableNow` processes the backlog and terminates — the same code
runs unbounded against a live directory/Kafka source at scale).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# file-source streams require an explicit schema; ts arrives as long
# nanos (TIMESTAMP(NANOS) parquet + nanosAsLong, see session.py)
_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _stream_input_dir(sf_dir: str) -> str:
    """The file stream source wants a directory to watch; stage one with a
    symlink to the fixture (in production this is the landing directory
    new files arrive into)."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"hbs_stream_in_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded read of the events table with a proper event-time column.

    ts becomes TIMESTAMP (session-tz UTC): watermarks require it. The
    nanos→micros conversion uses integer `div` — epoch nanos exceed 2^53
    so float division would corrupt low microseconds."""
    raw = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .format("parquet")
        .load(_stream_input_dir(sf_dir))
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(
    df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the final result as a batch DataFrame."""
    name = name or f"stream_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(
        tempfile.gettempdir(), f"hbs_checkpoint_{uuid.uuid4().hex[:12]}"
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
