from .windows import (
    events_stream,
    run_stream_to_memory,
    session_stats_stream,
    sliding_counts_stream,
    stream_dedup,
    tumbling_counts_stream,
)

__all__ = [
    "events_stream",
    "run_stream_to_memory",
    "session_stats_stream",
    "sliding_counts_stream",
    "stream_dedup",
    "tumbling_counts_stream",
]
