from .events import (
    EVENTS_SCHEMA,
    dedup_events,
    first_event_per_key,
    read_events_stream,
    sessionize,
    sliding_value_stats,
    tumbling_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_counts",
    "sliding_value_stats",
    "sessionize",
    "dedup_events",
    "first_event_per_key",
]
