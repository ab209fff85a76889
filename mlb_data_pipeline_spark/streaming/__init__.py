from .jobs import (  # noqa: F401
    running_user_totals_stream,
    dedup_stream,
    incremental_neardup_stream,
    read_document_stream,
    read_event_stream,
    run_available_now,
    session_counts_stream,
    sliding_counts_stream,
    stream_static_join,
    stream_stream_join,
    text_index_stream,
    tumbling_counts_stream,
)
