from hiveberg_spark.streaming.events import events_stream, run_to_memory

__all__ = ["events_stream", "run_to_memory"]
