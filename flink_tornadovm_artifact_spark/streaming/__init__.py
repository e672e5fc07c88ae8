"""Structured Streaming mirrors of the reference's DataStream surface
(SURVEY.md §2.G)."""

from .iterate import StreamIteration
from .core import (
    ExternalQueryableState,
    LateRowTracker,
    QueryableState,
    allowed_lateness_side_output,
    connect_with_control,
    deduplicate_stream,
    interval_join_streams,
    keyed_count_trigger,
    keyed_process_timeout,
    keyed_running_agg,
    session_window_agg,
    sliding_window_agg,
    split_stream,
    tumbling_window_agg,
    windowed_cogroup,
    windowed_join_streams,
)
from .cep import (
    cep_followed_by_stream,
    cep_one_or_more_stream,
    cep_optional_stream,
    cep_times_range_stream,
    cep_times_stream,
)
from .savepoint import read_keyed_state
from .sources import events_file_stream, memory_sink_run, with_ingestion_time
from .triggers import (
    ContinuousEventTimeTrigger,
    CountEvictor,
    CountTrigger,
    DeltaEvictor,
    DeltaTrigger,
    TimeEvictor,
    purging,
    windowed_trigger_agg,
)

__all__ = [
    "CountTrigger",
    "ContinuousEventTimeTrigger",
    "DeltaTrigger",
    "purging",
    "CountEvictor",
    "TimeEvictor",
    "DeltaEvictor",
    "windowed_trigger_agg",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "keyed_running_agg",
    "keyed_count_trigger",
    "keyed_process_timeout",
    "interval_join_streams",
    "windowed_join_streams",
    "windowed_cogroup",
    "deduplicate_stream",
    "split_stream",
    "connect_with_control",
    "allowed_lateness_side_output",
    "ExternalQueryableState",
    "LateRowTracker",
    "QueryableState",
    "cep_followed_by_stream",
    "cep_one_or_more_stream",
    "cep_optional_stream",
    "cep_times_range_stream",
    "cep_times_stream",
    "StreamIteration",
    "events_file_stream",
    "read_keyed_state",
    "memory_sink_run",
    "with_ingestion_time",
]
