from .events import streaming_event_counts, batch_event_counts  # noqa: F401
