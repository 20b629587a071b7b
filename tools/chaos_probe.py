"""Task-failure recovery probe — the local analog of the reference's
chaos tests (`mapreduce/tests/whitebox_tests/tests.py:31-33`: kubectl
delete a random worker pod 1 s after submit, assert the job still
converges to the golden output).

On Spark the recovery mechanism is lineage + task retry instead of
coordinator-driven part reassignment, and it CAN be exercised
locally: ``local[4, 2]`` enables task retries (plain ``local[N]``
fails the job on first task failure), and an Arrow-batched stage
injects exactly one failure — the first attempt of one partition
raises; its retry succeeds. The run must produce results identical
to an uninjected run, proving a lost task re-executes from lineage
without corrupting or duplicating output.

Runs in its own subprocess-friendly session (the retrying master
can't be set on an existing SparkContext). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.functions.text import wordcount
from irio2024_mapreduce_spark.session import ensure_session_confs

FAIL_PARTITION = 3


def _inject(it):
    """Pass-through pandas batches, but the FIRST attempt of one
    partition dies mid-stream — after yielding a batch, so the retry
    also proves partial output of a failed attempt is discarded."""
    ctx = TaskContext.get()
    fail = (
        ctx.partitionId() == FAIL_PARTITION and ctx.attemptNumber() == 0
    )
    first = True
    for batch in it:
        yield batch
        if fail and first:
            first = False
            raise RuntimeError(
                "chaos probe: injected task failure "
                f"(partition {ctx.partitionId()}, attempt 0)"
            )
    if fail and first:  # partition had no batches: still fail attempt 0
        raise RuntimeError("chaos probe: injected task failure (empty)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.appName("chaos-probe")
        .master("local[4, 2]")  # 4 threads, 2 task attempts
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_confs(spark)

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(F.col("text").alias("value"))
        .repartition(8)  # ensure FAIL_PARTITION exists
    )
    chaotic = docs.mapInPandas(_inject, schema="value string")

    clean = sorted(map(tuple, wordcount(docs).collect()))
    survived = sorted(map(tuple, wordcount(chaotic).collect()))

    ok = clean == survived and len(clean) > 0
    print(
        json.dumps(
            {
                "mode": "task_failure_recovery",
                "rows": len(clean),
                "identical_to_clean_run": ok,
            }
        )
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
