"""Continuous corpus construction: the incremental ingest driver
(``plans.ingest.ingest_batch``) mounted on a Structured Streaming
file source via ``foreachBatch`` — document batches land in a
directory, every micro-batch is admitted against the STORED corpus
indexes, cleaned, and appended (corpus + index), exactly the daily
path but event-driven.

Why ``foreachBatch`` and not a stateful streaming operator: the
admission decision needs joins against an append-only on-disk index
whose rows this very stream produces — that is batch-relational work
over durable state, not watermark-bounded per-key state.
``foreachBatch`` hands each micro-batch over as a normal DataFrame,
the driver runs the identical (test-covered, verdict-parity-checked)
batch logic, and Spark's checkpoint replays batches in file order.
Micro-batches execute sequentially, so batch N+1 always sees batch
N's index appends — the property ``tests/test_ingest.py``'s two-day
scenario pins for the batch form and
``tests/test_streaming_ingest.py`` re-pins through the stream.

Delivery is AT-LEAST-once, not exactly-once: foreachBatch commits the
checkpoint AFTER the handler returns, so a crash between
``ingest_batch``'s appends and the commit re-delivers that batch on
restart. ``ingest_batch``'s write order makes the redelivery safe —
the re-ingested docs self-convict against the index rows that already
landed (see plans/ingest.py's durability note) — so the corpus never
gains duplicates; the batch's manifest is recorded twice (once with
the kills) and the in-memory ``manifests`` list covers only the
current process's batches.

Scale shape: unchanged from the batch driver — every join is
batch-keyed, index reads are hash probes, appends are batch-sized.
The stream adds only the file-source bookkeeping.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from irio2024_mapreduce_spark.plans.ingest import ingest_batch


def run_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_dir: str,
    corpus_dir: str,
    files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
    family: str = "ngram",
) -> list[dict]:
    """Drain ``source_dir`` (availableNow) through the ingest driver,
    one ``ingest_batch`` call per micro-batch; ``family`` must match
    the index build (same contract as ``ingest_batch``). Returns the
    per-batch manifests in processing order."""
    manifests: list[dict] = []

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        m = ingest_batch(
            spark, batch_df, index_dir, corpus_dir, family=family
        )
        m["batch_id"] = int(batch_id)
        manifests.append(m)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or tempfile.mkdtemp(prefix="ingest_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return manifests
