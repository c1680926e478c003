from .ops import (  # noqa: F401
    events_stream,
    interval_join,
    join_then_window_counts,
    run_to_memory,
    session_windows,
    sliding_counts,
    stateful_user_stats,
    stateful_user_stats_tws,
    stream_static_enrich_counts,
    stream_to_partitioned_sink,
    tumbling_counts,
    watermarked_distinct,
)
