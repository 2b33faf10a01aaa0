from .pipeline import (
    read_events_stream,
    run_streaming_upsert,
    streaming_tumbling_hourly_table,
)

__all__ = [
    "read_events_stream",
    "run_streaming_upsert",
    "streaming_tumbling_hourly_table",
]
