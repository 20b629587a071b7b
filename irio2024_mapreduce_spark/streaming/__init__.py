from irio2024_mapreduce_spark.streaming.jobs import (
    streaming_event_counts,
    streaming_wordcount,
)

__all__ = ["streaming_event_counts", "streaming_wordcount"]
