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
    streaming_click_purchase_join,
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
    # availableNow drains the whole fixture and an INNER stream-stream
    # join emits every match (the watermark bounds state, it never
    # truncates inner-join output on bounded input), so the oracle is
    # the plain batch join
    "streaming_click_purchase_join": """
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.ts       AS click_ts,
               p.ts       AS purchase_ts
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
}

ORACLE_SQL.update(stateful.ORACLE_SQL)

QUERIES = {
    "streaming_wordcount": streaming_wordcount,
    "streaming_event_counts": streaming_event_counts,
    **stateful.QUERIES,
    "streaming_click_purchase_join": streaming_click_purchase_join,
}
