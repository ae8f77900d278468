from .pipeline import stream_curate, stream_extract
from .stateful import stream_dedup
from .windowed import windowed_event_counts

__all__ = ["stream_extract", "stream_curate", "stream_dedup", "windowed_event_counts"]
