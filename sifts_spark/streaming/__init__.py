from sifts_spark.streaming.ingest import (
    make_idempotent_sink,
    stream_collection_ingest,
    windowed_event_aggregates,
    sessionized_event_aggregates,
)

__all__ = [
    "make_idempotent_sink",
    "stream_collection_ingest",
    "windowed_event_aggregates",
    "sessionized_event_aggregates",
]
