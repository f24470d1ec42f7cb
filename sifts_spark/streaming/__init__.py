from sifts_spark.streaming.ingest import (
    make_idempotent_sink,
    stream_collection_appends,
    stream_collection_ingest,
    stream_stream_enrich_join,
    streaming_snapshot_updates,
    windowed_event_aggregates,
    sessionized_event_aggregates,
)
from sifts_spark.streaming.stateful import batch_user_stats, running_user_stats

__all__ = [
    "make_idempotent_sink",
    "stream_collection_appends",
    "stream_collection_ingest",
    "stream_stream_enrich_join",
    "streaming_snapshot_updates",
    "windowed_event_aggregates",
    "sessionized_event_aggregates",
    "batch_user_stats",
    "running_user_stats",
]
