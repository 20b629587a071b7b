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


def test_event_time_timeout_evicts_idle_state(spark, tmp_path):
    """Production mode: a user who goes idle mid-stream must have
    their open session FLUSHED (emitted as closed) and their state
    evicted once the watermark passes last + gap — under NoTimeout
    the same session stays open/unemitted forever. Three files, one
    micro-batch each, so the watermark advances between batches:

    * file0: user 1 (t0, t0+5m) and user 2 (t0)
    * file1: user 2 only (t0+5h)   → watermark passes user 1's timeout
    * file2: user 2 only (t0+10h)  → batch in which the timeout FIRES
    """
    import datetime as dt
    import glob
    import os
    import shutil

    from irio2024_mapreduce_spark.streaming.stateful import (
        run_sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta

    def mk(rows):
        return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    files = [
        mk([(1, t0, 1.0), (1, t0 + m(minutes=5), 2.0), (2, t0, 3.0)]),
        mk([(2, t0 + m(hours=5), 4.0)]),
        mk([(2, t0 + m(hours=10), 5.0)]),
    ]
    src = tmp_path / "evict_src"
    src.mkdir()
    for i, df in enumerate(files):
        stage = str(tmp_path / f"f{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    schema = files[0].schema
    flushed = run_sessionize_stream(
        spark, str(src), schema,
        max_files_per_trigger=1, timeout="event_time",
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in flushed.collect()
    }
    # user 1's only session was flushed by the timeout (NoTimeout
    # would withhold it as the open tail)...
    assert (1, t0, 2) in got
    # ...user 2's two gap-closed sessions are emitted normally...
    assert (2, t0, 1) in got and (2, t0 + m(hours=5), 1) in got
    # ...and user 2's live tail (t0+10h) is still open, not flushed
    assert len(got) == 3

    # control: bounded-replay mode over the SAME files withholds
    # user 1's session (it is their open tail at drain time)
    unflushed = run_sessionize_stream(
        spark, str(src), schema,
        max_files_per_trigger=1, timeout="none",
    )
    got_none = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in unflushed.collect()
    }
    assert (1, t0, 2) not in got_none
    assert got_none == {(2, t0, 1), (2, t0 + m(hours=5), 1)}


def test_sessionize_late_event_merges_without_regressing_last(
    spark, tmp_path
):
    """A late event older than the open session's `last` (straddling
    a micro-batch boundary) must merge into the session — counted,
    summed — WITHOUT moving `last` backwards: the closed session must
    still report the true latest timestamp, and the next event's gap
    decision must be made against it."""
    import datetime as dt
    import glob
    import os
    import shutil

    from irio2024_mapreduce_spark.streaming.stateful import (
        run_sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )

    files = [
        # batch 0: session open with start=t0, last=t0+10m
        mk([(1, t0, 1.0), (1, t0 + m(minutes=10), 2.0)]),
        # batch 1: a LATE event (t0+5m < last) then a gap-closing one
        mk([(1, t0 + m(minutes=5), 4.0), (1, t0 + m(hours=2), 8.0)]),
    ]
    src = tmp_path / "late_src"
    src.mkdir()
    for i, df in enumerate(files):
        stage = str(tmp_path / f"late{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    out = run_sessionize_stream(
        spark, str(src), files[0].schema, max_files_per_trigger=1
    )
    rows = out.collect()
    assert len(rows) == 1  # the t0+2h event stays open in state
    r = rows[0]
    assert r["session_start"] == t0
    # last must be the TRUE latest (t0+10m), not the late arrival
    assert r["session_last"] == t0 + m(minutes=10)
    # the late event was merged, not dropped and not a new session
    assert r["n_events"] == 3
    assert r["sum_value"] == 7.0


def test_sessionizer_runs_on_rocksdb_state_store(spark, tmp_path):
    """The SPARK_GRAFT_ROCKSDB_STATE flag pins
    RocksDBStateStoreProvider — prove the class name is real and the
    sessionizer produces identical results on it (providerClass is
    read per query start, so it's runtime-settable for the test)."""
    import datetime as dt
    import glob
    import os
    import shutil

    from irio2024_mapreduce_spark.streaming.stateful import (
        run_sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta
    df = spark.createDataFrame(
        [
            (1, t0, 1.0),
            (1, t0 + m(minutes=5), 2.0),
            (1, t0 + m(hours=2), 3.0),
            (2, t0, 4.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    src = tmp_path / "rocks_src"
    src.mkdir()
    stage = str(tmp_path / "rocks_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.copy(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        str(src / "b0.parquet"),
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = sorted(map(tuple, run_sessionize_stream(
            spark, str(src), df.schema
        ).collect()))
    finally:
        spark.conf.unset(key)
    default = sorted(map(tuple, run_sessionize_stream(
        spark, str(src), df.schema
    ).collect()))
    # one closed session (user 1's first), identical on both providers
    assert rocks == default
    assert len(rocks) == 1 and rocks[0][0] == 1 and rocks[0][3] == 2


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

    from irio2024_mapreduce_spark.sources.tables import load_table

    # load_table (NOT a raw parquet read): it normalizes events.ts to
    # session-zoned TIMESTAMP regardless of the fixture's physical type
    # (int64 nanos in some rounds, TIMESTAMP_NTZ in others) — percentile
    # rejects TIMESTAMP_NTZ outright, and the written halves must carry
    # the same schema the engine-side streaming readers produce.
    events = load_table(spark, sf_dir, "events")
    # percentile() only accepts NUMERIC input (it rejects TIMESTAMP and
    # TIMESTAMP_NTZ alike), so take the median over unix_micros and
    # split on the same numeric expression
    m = events.selectExpr(
        "percentile(unix_micros(ts), 0.5) AS m"
    ).collect()[0]["m"]
    src = tmp_path / "two_batch_src"
    src.mkdir()
    halves = [
        events.filter(F.unix_micros("ts") <= m),
        events.filter(F.unix_micros("ts") > m),
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


def test_stream_stream_join_batch_parity_and_oracle(spark, sf_dir):
    """The watermark-bounded stream-stream join must emit exactly the
    pairs the equivalent BATCH join produces (availableNow drains the
    whole fixture, and an inner join is never truncated by the
    watermark on bounded input), and both must match an independent
    DuckDB oracle over the same parquet."""
    import duckdb

    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.sources.tables import load_table
    from irio2024_mapreduce_spark.streaming.jobs import (
        streaming_click_purchase_join,
    )

    got = sorted(
        map(tuple, streaming_click_purchase_join(spark, sf_dir).collect())
    )
    assert len(got) > 0

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("purchase_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = sorted(
        map(
            tuple,
            clicks.join(
                purchases,
                F.expr(
                    "click_user = purchase_user "
                    "AND purchase_ts >= click_ts "
                    "AND purchase_ts <= click_ts + interval 30 minutes"
                ),
            )
            .select(
                F.col("click_user").alias("user_id"),
                "click_id",
                "purchase_id",
                "click_ts",
                "purchase_ts",
            )
            .collect(),
        )
    )
    assert got == batch

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT c.user_id, c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM read_parquet('{sf_dir}/events.parquet') c
        JOIN read_parquet('{sf_dir}/events.parquet') p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        ORDER BY 1, 2, 3
        """
    ).fetchall()
    assert [(r[0], r[1], r[2]) for r in got] == [tuple(r) for r in oracle]


def test_stream_stream_join_state_carries_across_micro_batches(
    spark, tmp_path
):
    """A click arriving in micro-batch 0 must match a purchase that
    only arrives in micro-batch 1: the join buffers the click in the
    state store across the batch boundary. Also asserts the watermark
    EVICTS state: user 2's purchase is IN the 30-minute range of
    their click (click_ts + 10 min) but delivered two batches later,
    after batch 1 advanced the watermark hours past click_ts + 30 min
    — so a no-match outcome can only come from watermark semantics
    (evicted click state / late-input drop), not from the range
    condition.

    Watermark updates take effect one batch after the data that
    advances them, and state eviction runs at the END of a batch — so
    the horizon-advancing events land in batch 1, batch 2 runs (and
    ends) under the advanced watermark evicting user 2's click, and
    the late purchase arrives in batch 3."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    files = [
        # batch 0: two clicks — user 1 (will match in batch 1) and
        # user 2 (whose in-range purchase arrives too late)
        mk([(1, t0, 1, "click"), (2, t0, 2, "click")]),
        # batch 1: user 1 purchase 10 min after the click (in range,
        # on time); plus a user-3 click AND a user-9 purchase at
        # t0+6h that advance BOTH sides' watermarks (global watermark
        # is the min across inputs) to t0+5h30m — hours past user 2's
        # click_ts + 30 min matchable horizon
        mk([
            (3, t0 + m(minutes=10), 1, "purchase"),
            (4, t0 + m(hours=6), 3, "click"),
            (6, t0 + m(hours=6), 9, "purchase"),
        ]),
        # batch 2: benign traffic only — runs under the advanced
        # watermark; at its end user 2's click state (matchable only
        # up to click_ts + 30 min, hours below the watermark) is
        # evicted
        mk([
            (7, t0 + m(hours=6, minutes=5), 10, "click"),
            (8, t0 + m(hours=6, minutes=5), 11, "purchase"),
        ]),
        # batch 3: user 2's purchase at click_ts + 10 min — INSIDE
        # the 30-minute range condition, but its event time is hours
        # behind the watermark and the matching click state is gone.
        # If eviction were broken, this WOULD match.
        mk([(5, t0 + m(minutes=10), 2, "purchase")]),
    ]
    src = tmp_path / "ssj_src"
    src.mkdir()
    for i, df in enumerate(files):
        stage = str(tmp_path / f"ssj{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    def side(evt, prefix):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .filter(F.col("event_type") == evt)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "30 minutes")
        )

    import uuid

    from irio2024_mapreduce_spark.streaming.jobs import _drain

    joined = side("click", "click").join(
        side("purchase", "purchase"),
        F.expr(
            "click_user = purchase_user "
            "AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + interval 30 minutes"
        ),
    ).select("click_user", "click_id", "purchase_id")
    # unique query name per run: _drain keys the checkpoint dir off
    # the name, and a memory-sink query refuses to resume a leftover
    # checkpoint from a previous test session
    name = f"ssj_carry_{uuid.uuid4().hex[:8]}"
    _drain(joined.writeStream.outputMode("append"), name)
    got = sorted(map(tuple, spark.table(name).collect()))
    # exactly the cross-batch (user 1) match; user 2's out-of-range
    # late purchase matches nothing
    assert got == [(1, 1, 3)]


def test_streaming_dedup_batch_parity_and_oracle(spark, sf_dir):
    """streaming_dedup stages the fixture twice (every row delivered
    twice); the output must equal SELECT DISTINCT over the single
    fixture — checked against both the batch engine and DuckDB."""
    import duckdb

    from irio2024_mapreduce_spark.sources.tables import load_table
    from irio2024_mapreduce_spark.streaming.jobs import streaming_dedup

    got = sorted(
        map(tuple, streaming_dedup(spark, sf_dir).collect())
    )
    assert len(got) > 0
    # no id appears twice even though every row arrived twice
    ids = [r[0] for r in got]
    assert len(ids) == len(set(ids))

    ev = load_table(spark, sf_dir, "events")
    # key-dedup == row-distinct only if event_id is unique per row
    assert ev.count() == ev.select("event_id").distinct().count()
    batch = sorted(
        map(
            tuple,
            ev.select("event_id", "user_id", "event_type", "ts")
            .distinct()
            .collect(),
        )
    )
    assert got == batch

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT DISTINCT event_id, user_id, event_type
        FROM read_parquet('{sf_dir}/events.parquet')
        ORDER BY 1, 2, 3
        """
    ).fetchall()
    assert [(r[0], r[1], r[2]) for r in got] == [tuple(r) for r in oracle]


def test_streaming_dedup_state_carries_across_micro_batches(
    spark, tmp_path
):
    """Redelivery across a micro-batch boundary must still dedup (the
    key state carries in the state store), and a redelivery arriving
    AFTER the watermark horizon must not re-emit (it is older than
    the watermark and late-dropped — the mechanism that lets state
    stay bounded while the downstream table stays exactly-once).

    Batch layout (maxFilesPerTrigger=1, 30-minute delay):
      0: events 1,2 at t0                  -> both emitted
      1: DUP of event 1 (same id/ts) + event 3 at t0+6h
         (watermark still behind t0: dup dropped FROM STATE; 3 emitted)
      2: DUP of event 2 + event 4 at t0+6h5m — runs under the
         advanced watermark (t0+5h30m): the dup's ts t0 is hours
         late, dropped as late input; 4 emitted
    Expected: ids {1,2,3,4}, each exactly once."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    from irio2024_mapreduce_spark.streaming.jobs import _drain

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    files = [
        mk([(1, t0, 1, "click"), (2, t0, 2, "view")]),
        mk([(1, t0, 1, "click"), (3, t0 + m(hours=6), 3, "click")]),
        mk([
            (2, t0, 2, "view"),
            (4, t0 + m(hours=6, minutes=5), 4, "view"),
        ]),
    ]
    src = tmp_path / "sdd_src"
    src.mkdir()
    for i, df in enumerate(files):
        stage = str(tmp_path / f"sdd{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    deduped = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id")
    )
    name = f"sdd_carry_{uuid.uuid4().hex[:8]}"
    _drain(deduped.writeStream.outputMode("append"), name)
    got = sorted(map(tuple, spark.table(name).collect()))
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_event_time_timeout_accepts_fully_late_key(spark, tmp_path):
    """A key whose ENTIRE traffic arrives behind the watermark (other
    keys' later events advanced it in an earlier batch) must flush
    its session immediately as closed instead of crashing: stateful
    group-map operators receive late rows un-filtered, and arming a
    timeout at last + gap < watermark raises
    INVALID_TIMEOUT_TIMESTAMP (found by tools/stress_streaming.py at
    100x multi-batch; fixed in streaming/stateful.py).

    * file0: user 9 at t0+20h      -> batch 1's watermark lands at
      t0+19h50m
    * file1: user 1 at t0, t0+5m   -> entirely 19h behind the
      watermark; last + gap (t0+35m) << watermark
    """
    import datetime as dt
    import glob
    import os
    import shutil

    from irio2024_mapreduce_spark.streaming.stateful import (
        run_sessionize_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )

    files = [
        mk([(9, t0 + m(hours=20), 1.0)]),
        mk([(1, t0, 1.0), (1, t0 + m(minutes=5), 2.0)]),
    ]
    src = tmp_path / "late_key_src"
    src.mkdir()
    for i, df in enumerate(files):
        stage = str(tmp_path / f"lk{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    schema = files[0].schema
    flushed = run_sessionize_stream(
        spark, str(src), schema,
        max_files_per_trigger=1, timeout="event_time",
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in flushed.collect()
    }
    # user 1's fully-late session is flushed as closed (2 events,
    # correct bounds) rather than crashing the query or lingering
    assert (1, t0, 2) in got


def test_streaming_restart_recovers_from_checkpoint_exactly_once(
    spark, tmp_path
):
    """Restart a streaming query from its checkpoint and the output
    must stay exactly-once: no reprocessing (no duplicates in the
    sink), no holes. This is the property that lets a production
    stream survive driver restarts.

    Uses a parquet file sink (a memory sink dies with the query, so
    it can't witness recovery); the aggregation is the watermarked
    dedup shape so STATE-STORE recovery is exercised too: a later
    file re-delivers the first file's rows, and only recovered state
    can know they are duplicates. The cut point is deterministic:
    incarnation 1 runs while only file0 exists (availableNow drains
    what's there and terminates, exactly like a job that committed
    up to a point and was then redeployed)."""
    import datetime as dt
    import glob
    import os
    import shutil

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta
    schema = "event_id long, ts timestamp, user_id long"

    files = [
        spark.createDataFrame(
            [(1, t0, 1), (2, t0 + m(minutes=1), 2)], schema
        ),
        spark.createDataFrame([(3, t0 + m(minutes=2), 3)], schema),
        # redelivery of file0's first row + a fresh one: recovered
        # dedup state must drop the former, admit the latter
        spark.createDataFrame(
            [(1, t0, 1), (4, t0 + m(minutes=3), 4)], schema
        ),
    ]
    src = tmp_path / "restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "restart_ckpt")
    out = str(tmp_path / "restart_out")

    def stage(i):
        st = str(tmp_path / f"rs{i}")
        files[i].coalesce(1).write.mode("overwrite").parquet(st)
        part = glob.glob(os.path.join(st, "part-*.parquet"))[0]
        dst = str(src / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    def run_to_completion():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage(0)
    run_to_completion()  # incarnation 1: drains file0, terminates
    assert sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 2]

    stage(1)  # the rest lands while the job is DOWN
    stage(2)
    run_to_completion()  # incarnation 2: same checkpoint, resumes

    got = sorted(
        (r["event_id"], r["user_id"])
        for r in spark.read.parquet(out).collect()
    )
    # ids 1-4 exactly once each: file0 was not replayed into the
    # sink, nothing was skipped, and the redelivered (1, t0) row was
    # deduped by state recovered across the restart
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_quality_funnel_runs_unchanged_as_a_stream(spark, sf_dir):
    """Spark-first dividend: the funnel is declarative (map
    expressions + one aggregation), so the SAME operator logic runs
    under Structured Streaming with zero changes — readStream in,
    complete-mode aggregate out, result identical to the batch
    query. This is the property that lets a 100 TB corpus-cleaning
    pipeline run incrementally over a landing directory instead of
    re-scanning the corpus per day."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.operators.text_analysis import (
        FUNNEL_MAX_REPETITION_X10K,
        FUNNEL_MIN_STOPWORDS,
        FUNNEL_MIN_TOKENS,
        STOPWORDS,
        quality_funnel,
    )
    from irio2024_mapreduce_spark.streaming.jobs import _drain, _stage_dir

    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(_stage_dir(path))

    toks = F.split("text", " ")
    rep_x10k = F.expr(
        "10000 - (10000 * size(array_distinct(split(text, ' '))))"
        " div size(split(text, ' '))"
    )
    stop_cnt = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    verdict = (
        F.when(F.col("text").isNull(), "null_text")
        .when(F.size(toks) < FUNNEL_MIN_TOKENS, "too_short")
        .when(rep_x10k > FUNNEL_MAX_REPETITION_X10K, "too_repetitive")
        .when(stop_cnt < FUNNEL_MIN_STOPWORDS, "no_stopwords")
        .otherwise("pass")
    )
    k = lambda v: F.sum(  # noqa: E731
        F.when(F.col("verdict") == v, 1).otherwise(0)
    ).alias(f"k_{v}")
    agg = (
        stream.select("source", verdict.alias("verdict"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_in"),
            k("null_text"),
            k("too_short"),
            k("too_repetitive"),
            k("no_stopwords"),
            F.sum(
                F.when(F.col("verdict") == "pass", 1).otherwise(0)
            ).alias("docs_out"),
        )
    )
    name = f"sfq_{uuid.uuid4().hex[:8]}"
    _drain(agg.writeStream.outputMode("complete"), name)
    streamed = sorted(map(tuple, spark.table(name).collect()))
    batch = sorted(map(tuple, quality_funnel(spark, sf_dir).collect()))
    assert streamed == batch and len(batch) > 0


def test_sessionize_output_schema_matches_contract(spark, sf_dir):
    """OUTPUT_SCHEMA documents the drained sessionizer's contract —
    assert it so a projection drift can't silently strand the
    constant."""
    import os

    from irio2024_mapreduce_spark.streaming.jobs import _stage_dir
    from irio2024_mapreduce_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        run_sessionize_stream,
    )

    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    out = run_sessionize_stream(spark, _stage_dir(path), raw_schema)
    expected = spark.createDataFrame([], OUTPUT_SCHEMA).schema
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in expected
    ]
