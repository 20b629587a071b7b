"""Multimodal decode scale probe — the one operator family without a
100× stress row through round 6.

Stages documents replicated N× (id shifts are multiples of 30 so both
the %3 media-type stripes and the %10 batch stripes survive), then
times the three decode-bearing queries end-to-end (noop sink):

  * ``multimodal_pipeline`` — P6 image decode + nearest-neighbor
    resize over ``mapInPandas``;
  * ``multimodal_audio``    — PCM-WAV RIFF-walk decode;
  * ``multimodal_frames``   — uncompressed-AVI decode + frame
    sampling (REAL bytes→frames since r7).

All three are map-only Arrow-batched stages, so the expectation is
~linear wall growth with input (ratio ≈ N × base / measured — the
interesting failure mode would be Arrow batch handling degrading on
wide binary columns). Prints one JSON line.

Usage: python tools/stress_multimodal.py [N]   (default 100)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.multimodal import (
    multimodal_audio,
    multimodal_frames,
    multimodal_pipeline,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def build_staging(spark, base: str, n: int) -> str:
    stage = tempfile.mkdtemp(prefix="stress_mm_")
    docs = load_table(spark, base, "documents")
    (
        docs.withColumn("k", F.explode(F.expr(f"sequence(0, {n - 1})")))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("k").cast("long") * 30_000_000,
        )
        .drop("k")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(stage, "documents.parquet"))
    )
    return stage


def timed(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {
        "multimodal_pipeline": multimodal_pipeline,
        "multimodal_audio": multimodal_audio,
        "multimodal_frames": multimodal_frames,
    }
    out: dict[str, dict] = {}
    for label, scale in [("1x", 1), (f"{n}x", n)]:
        stage = build_staging(spark, base, scale) if scale > 1 else base
        rows = load_table(spark, stage, "documents").count()
        for qname, fn in queries.items():
            drain_driver_backlog(spark)

            def run():
                fn(spark, stage).write.mode("overwrite").format(
                    "noop"
                ).save()

            run()  # warm (file listing, codegen)
            out.setdefault(qname, {})[label] = {
                "input_rows": rows,
                "sec": timed(run),
            }
    for qname, d in out.items():
        d["ratio"] = round(
            d[f"{n}x"]["sec"] / max(d["1x"]["sec"], 0.01), 1
        )
    print(json.dumps({"scale": n, "results": out}))


if __name__ == "__main__":
    main()
