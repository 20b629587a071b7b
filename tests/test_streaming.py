"""Streaming tests: stream/batch parity and watermark cut."""

from __future__ import annotations

from irio2024_mapreduce_spark.operators.events import event_tumbling
from irio2024_mapreduce_spark.registry import wordcount_query
from irio2024_mapreduce_spark.streaming.jobs import (
    streaming_event_counts,
    streaming_wordcount,
)


def test_stream_batch_wordcount_parity(spark, sf_dir):
    stream = {
        (r["word"], r["cnt"])
        for r in streaming_wordcount(spark, sf_dir).collect()
    }
    batch = {
        (r["word"], r["cnt"]) for r in wordcount_query(spark, sf_dir).collect()
    }
    assert stream == batch and len(stream) > 0


def test_stateful_sessionize_emits_only_closed(spark, sf_dir):
    """applyInPandasWithState sessionization: emitted sessions == the
    batch session_window result MINUS each user's final (open)
    session."""
    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.streaming.stateful import (
        streaming_sessionize,
    )

    emitted = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in streaming_sessionize(spark, sf_dir).collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in load_batch_sessions(spark, sf_dir)
    }
    assert emitted < batch  # strict subset: open tails withheld
    withheld = batch - emitted
    # exactly one open session per user present in the stream
    users = {u for u, _, _ in batch}
    assert len(withheld) == len(users)


def load_batch_sessions(spark, sf_dir):
    from irio2024_mapreduce_spark.operators.events import event_session

    return event_session(spark, sf_dir).collect()


def test_watermark_withholds_open_windows(spark, sf_dir):
    """Append mode emits only watermark-closed windows: the emitted
    set must be a strict subset of the batch windows, missing exactly
    the trailing (still-open) ones."""
    emitted = {
        (r["window_start"], r["event_type"], r["cnt"])
        for r in streaming_event_counts(spark, sf_dir).collect()
    }
    batch = {
        (r["window_start"], r["event_type"], r["cnt"])
        for r in event_tumbling(spark, sf_dir).collect()
    }
    assert emitted <= batch
    withheld = batch - emitted
    assert withheld  # the tail windows within the watermark delay
    max_emitted = max(w for w, _, _ in emitted)
    assert all(w >= max_emitted for w, _, _ in withheld)


def test_sessionize_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    """Split the event fixture into two time-ordered files and force
    one micro-batch per file: closed sessions must equal the
    single-batch run — i.e., a session straddling the batch boundary
    is stitched from the state store, not dropped or restarted."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.streaming.stateful import (
        run_sessionize_stream,
        streaming_sessionize,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    m = events.selectExpr("percentile(ts, 0.5) AS m").collect()[0]["m"]
    src = tmp_path / "two_batch_src"
    src.mkdir()
    halves = [
        events.filter(F.col("ts") <= m),
        events.filter(F.col("ts") > m),
    ]
    for i, half in enumerate(halves):
        stage = str(tmp_path / f"half{i}")
        half.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        # FileStreamSource picks files up oldest-mtime-first: pin the
        # order so batch0 (earlier events) is the first micro-batch
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    assert halves[0].count() > 0 and halves[1].count() > 0

    two_batch = run_sessionize_stream(
        spark, str(src), events.schema, max_files_per_trigger=1
    )
    one_batch = streaming_sessionize(spark, sf_dir)
    a = sorted(map(tuple, two_batch.collect()))
    b = sorted(map(tuple, one_batch.collect()))
    assert a == b and len(a) > 0
