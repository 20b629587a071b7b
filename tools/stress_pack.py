"""pack_sequences scale probe: two-phase distributed prefix sum vs
the naive Exchange-SinglePartition window at 1× and N× corpus size.

The scaled corpus replicates sf0.1 documents N× in ONE pass
(explode over a replica-index sequence, shifted doc_ids) and writes
multi-file parquet, so both forms read identical real splits. Parity
(identical results) is asserted at N× via full aggregate signature
BEFORE timing; each timed form runs min-of-2 with the driver backlog
drained outside the windows.

Usage: python tools/stress_pack.py [N]     (default 100)
Prints one JSON line: seconds per form at each scale + ratios.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.llm_prep import (
    pack_sequences,
    pack_sequences_naive,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark


def build_scaled_docs(spark, base: str, n: int) -> str:
    stage = tempfile.mkdtemp(prefix="stress_pack_")
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    (
        docs.withColumn("k", F.explode(F.expr(f"sequence(0, {n - 1})")))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("k").cast("long") * F.lit(10_000_000),
        )
        .drop("k")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(stage, "documents.parquet"))
    )
    return stage


def signature(df) -> tuple:
    row = df.agg(
        F.count("*"),
        F.sum("seq_offset"),
        F.sum("n_tokens"),
        F.max("pack_id"),
        F.sum("spans_boundary"),
        F.sum(F.expr("seq_offset * (doc_id % 997)")),
    ).collect()[0]
    return tuple(row)


def timed(fn, spark, d: str) -> float:
    best = float("inf")
    for _ in range(2):
        drain_driver_backlog(spark)
        t0 = time.perf_counter()
        fn(spark, d).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress_pack")
    spark.sparkContext.setLogLevel("ERROR")
    stage = build_scaled_docs(spark, base, n)

    # parity FIRST: the weighted-offset term makes the signature
    # sensitive to any doc receiving a different offset
    sig_dist = signature(pack_sequences(spark, stage))
    sig_naive = signature(pack_sequences_naive(spark, stage))
    assert sig_dist == sig_naive, (sig_dist, sig_naive)

    out = {}
    for label, d in [("1x", base), (f"{n}x", stage)]:
        out[label] = {
            "two_phase": timed(pack_sequences, spark, d),
            "naive_single_partition": timed(pack_sequences_naive, spark, d),
        }
    big = out[f"{n}x"]
    big["naive_over_two_phase"] = round(
        big["naive_single_partition"] / max(big["two_phase"], 0.01), 2
    )
    print(json.dumps({"scale": n, "parity": list(sig_dist), "results": out}))


if __name__ == "__main__":
    main()
