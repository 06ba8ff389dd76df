"""Structured Streaming: windowed aggregation, watermarks, stateful ops.

The reference has exactly one unbounded source (Mongo change streams,
readers/mongo.go:703-730) and NO windowing/watermark/stateful machinery —
its README lists those as future work (README.md:654-658, SURVEY §2.8).
This module is the beyond-reference implementation on Spark's engine.
"""

from goetl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from goetl_spark.streaming.sources import (
    append_replay_file,
    file_stream,
    rate_stream,
    replay_stream,
    replay_stream_ordered,
    state_partitions,
)
from goetl_spark.streaming.indexes import (
    make_index_appender,
    reset_index_marker,
    stream_index_append,
)

__all__ = [
    "tumbling_window_agg", "sliding_window_agg", "session_window_agg",
    "rate_stream", "file_stream", "replay_stream", "replay_stream_ordered",
    "append_replay_file", "state_partitions",
    "stream_index_append", "make_index_appender",
    "reset_index_marker",
]
