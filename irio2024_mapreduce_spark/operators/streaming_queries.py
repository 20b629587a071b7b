"""Streaming queries registered with the driver contract (E20).

``streaming_wordcount`` is hash-checked against the same DuckDB
oracle as batch E1 — stream/batch parity is the whole claim.
``streaming_event_counts`` emits only watermark-closed windows; the
oracle reproduces that cut with ``window_end <= max(ts) - 10 min``.
"""

from __future__ import annotations

from irio2024_mapreduce_spark.registry import WORDCOUNT_ORACLE
from irio2024_mapreduce_spark.streaming import stateful
from irio2024_mapreduce_spark.streaming.jobs import (
    streaming_event_counts,
    streaming_wordcount,
)

ORACLE_SQL = {
    "streaming_wordcount": WORDCOUNT_ORACLE,
    "streaming_event_counts": """
        WITH wm AS (SELECT MAX(ts) - INTERVAL '10 minutes' AS w FROM events)
        SELECT time_bucket(INTERVAL '1 hour', ts)                     AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
               event_type,
               COUNT(*) AS cnt
        FROM events
        GROUP BY 1, 2, 3
        HAVING window_end <= (SELECT w FROM wm)
    """,
}

ORACLE_SQL.update(stateful.ORACLE_SQL)

QUERIES = {
    "streaming_wordcount": streaming_wordcount,
    "streaming_event_counts": streaming_event_counts,
    **stateful.QUERIES,
}
