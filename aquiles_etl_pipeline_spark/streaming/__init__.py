from .ingest import stream_ingest_directory, stream_ingest_files
from .windows import dedup_events, session_stats, sliding_stats, tumbling_stats
from .stateful import user_running_totals

__all__ = [
    "dedup_events",
    "stream_ingest_directory",
    "stream_ingest_files",
    "tumbling_stats",
    "sliding_stats",
    "session_stats",
    "user_running_totals",
]
