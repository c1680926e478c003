from .ops import (  # noqa: F401
    events_stream,
    interval_join,
    run_to_memory,
    session_windows,
    sliding_counts,
    stateful_user_stats,
    tumbling_counts,
    watermarked_distinct,
)
