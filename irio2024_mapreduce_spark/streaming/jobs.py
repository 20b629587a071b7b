"""Structured Streaming jobs — SURVEY.md §2.3 E20.

The reference has no streaming at all (SURVEY §2.1 'explicitly
absent'); this is extension surface. Two jobs:

* **streaming_wordcount** — the flagship word count run as a stream:
  file source over the documents parquet, same tokenizer plan as E1,
  complete-mode aggregation. Batch/stream parity is the correctness
  claim: the final table must equal the batch E1 result (same DuckDB
  oracle).
* **streaming_event_counts** — event-time tumbling window + watermark
  + append mode: only windows the 10-minute watermark has closed are
  emitted. Late-data drop is therefore observable in the output: the
  trailing window(s) of the table are withheld.

Both run with ``Trigger.availableNow`` and block until drained, so
they behave deterministically under the driver's batch-style check.
In production the same plans run unbounded with checkpointed state
(``option("checkpointLocation", ...)`` on a durable store) and a
kafka/file sink; state-store size is bounded by the watermark
evicting closed windows.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.functions.text import wordcount
from irio2024_mapreduce_spark.session import ensure_session_confs


def _stage_dir(path: str) -> str:
    """FileStreamSource needs a *directory* (its basePath); stage the
    single parquet file into a temp dir. In production the source is
    already a directory that files land in — this staging exists only
    because the fixtures are single files."""
    tag = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"stream_src_{tag}")
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, os.path.basename(path))
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(path):
        shutil.copy2(path, dst)
    return d


def _stage_dir_dup(path: str) -> str:
    """Stage the fixture file TWICE under different names, so the
    stream genuinely receives every row (at least) twice — the
    at-least-once-delivery condition :func:`streaming_dedup` exists
    to repair. Deterministic per-source dir (same scheme as
    :func:`_stage_dir`) so repeated batteries reuse the copies
    instead of leaking a fresh /tmp dir per call."""
    tag = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"stream_dup_{tag}")
    os.makedirs(d, exist_ok=True)
    for i in (0, 1):
        dst = os.path.join(d, f"copy{i}_{os.path.basename(path)}")
        if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(
            path
        ):
            shutil.copy2(path, dst)
    return d


def _drain(writer, name: str) -> None:
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    q = (
        writer.queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # per-call uuid names mean a checkpoint is never reused — remove
    # it, or repeated test/bench/sweep batteries accumulate unbounded
    # /tmp trees
    shutil.rmtree(ckpt, ignore_errors=True)


def streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 as a stream; returns the final counts table (batch DF)."""
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(_stage_dir(path))
        .select(F.col("text").alias("value"))
    )
    counts = wordcount(stream)
    name = f"swc_{uuid.uuid4().hex[:8]}"
    _drain(counts.writeStream.outputMode("complete"), name)
    return spark.table(name)


def _normalize_event_ts(stream: DataFrame, raw_schema) -> DataFrame:
    """Streaming twin of the ts normalization in ``sources.tables
    .load_table``: the fixture generator has shipped ``events.ts`` as
    int64 nanos in some rounds and TIMESTAMP_NTZ µs in others; either
    becomes the session-zoned TIMESTAMP type (session tz pinned UTC,
    wall-clock values unchanged)."""
    ts_type = {f.name: f.dataType.simpleString() for f in raw_schema}.get("ts")
    if ts_type == "bigint":  # int64 nanos (nanosAsLong)
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if ts_type == "timestamp_ntz":
        # parquet µs with isAdjustedToUTC=false; session tz is pinned
        # UTC so the cast changes the type, not the wall-clock values
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts; append mode emits only
    watermark-closed windows (late-data drop made visible)."""
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    stream = _normalize_event_ts(
        spark.readStream.schema(raw_schema).parquet(_stage_dir(path)),
        raw_schema,
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )
    name = f"sec_{uuid.uuid4().hex[:8]}"
    _drain(agg.writeStream.outputMode("append"), name)
    return spark.table(name)


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: exactly-once rows out of at-least-once
    delivery in. The fixture file is staged TWICE, so every event
    arrives twice; ``dropDuplicatesWithinWatermark`` keys state on
    ``event_id`` and drops redeliveries while the first occurrence is
    inside the watermark horizon.

    Fourth Structured Streaming state shape in this package (after
    windowed aggregation, the applyInPandasWithState sessionizer, and
    the stream-stream join). State size is what makes this the right
    operator at 100 TB/day ingest: plain ``dropDuplicates`` on a
    stream keeps EVERY key forever (state grows with total history);
    the within-watermark form keeps only keys newer than
    (watermark − delay), so state is O(events per horizon) — and a
    redelivery that arrives LATER than the horizon is older than the
    watermark and is late-dropped by the same mechanism, so the
    downstream table stays exactly-once either way (pinned in
    tests/test_streaming.py).

    Batch equivalent / oracle: SELECT DISTINCT over the same columns
    (fixture ``event_id`` is unique per row, asserted in the test, so
    key-dedup equals row-distinct)."""
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    stream = _normalize_event_ts(
        spark.readStream.schema(raw_schema).parquet(_stage_dir_dup(path)),
        raw_schema,
    )
    deduped = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "ts")
    )
    name = f"sdd_{uuid.uuid4().hex[:8]}"
    _drain(deduped.writeStream.outputMode("append"), name)
    return spark.table(name)


def streaming_click_purchase_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream INNER JOIN with watermark-bounded state: click
    events joined to purchase events by the same user within 30
    minutes AFTER the click.

    This is the third Structured Streaming state shape (after the
    windowed aggregations and the applyInPandasWithState custom
    sessionizer): both inputs are unbounded, so Spark buffers each
    side in the state store and the JOIN TIME-RANGE CONDITION plus
    the two watermarks are what make state evictable — a click older
    than (watermark − 30 min) can never match a future purchase and
    is dropped. Without the range condition the state grows without
    bound; with it, state is O(events in the watermark horizon) on a
    1000-executor cluster regardless of total stream length. Append
    mode: each matched pair is emitted exactly once.

    Verified by batch parity (same join, batch DataFrames) and a
    DuckDB oracle in tests/test_streaming.py.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema

    def side(evt: str, prefix: str) -> DataFrame:
        return (
            _normalize_event_ts(
                spark.readStream.schema(raw_schema).parquet(
                    _stage_dir(path)
                ),
                raw_schema,
            )
            .filter(F.col("event_type") == evt)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "30 minutes")
        )

    joined = (
        side("click", "click")
        .join(
            side("purchase", "purchase"),
            F.expr(
                "click_user = purchase_user "
                "AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + interval 30 minutes"
            ),
        )
        .select(
            F.col("click_user").alias("user_id"),
            F.col("click_id"),
            F.col("purchase_id"),
            F.col("click_ts"),
            F.col("purchase_ts"),
        )
    )
    name = f"scpj_{uuid.uuid4().hex[:8]}"
    _drain(joined.writeStream.outputMode("append"), name)
    return spark.table(name)
