from sifts_spark.streaming.ingest import (
    stream_collection_ingest,
    windowed_event_aggregates,
    sessionized_event_aggregates,
)

__all__ = [
    "stream_collection_ingest",
    "windowed_event_aggregates",
    "sessionized_event_aggregates",
]
