from .ingest import stream_ingest_directory, stream_ingest_files
from .joins import stream_interval_join
from .stateful import user_running_totals
from .windows import dedup_events, session_stats, sliding_stats, tumbling_stats

__all__ = [
    "dedup_events",
    "stream_ingest_directory",
    "stream_ingest_files",
    "stream_interval_join",
    "tumbling_stats",
    "sliding_stats",
    "session_stats",
    "user_running_totals",
]
