from .events import (  # noqa: F401
    batch_event_counts,
    batch_session_counts,
    streaming_event_counts,
    streaming_exact_dedup,
    streaming_session_counts,
)
