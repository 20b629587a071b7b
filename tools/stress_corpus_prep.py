"""End-to-end corpus-prep scale probe: the COMPOSED pipeline
(holdout → exact dedup → near dedup → funnel → decontaminate → scrub
→ pack, plus two parquet writes) at 1× and N× distinct documents.

SCALE.md argues the composition adds no new scale surface because
every stage reuses an already-probed plan; this probe measures the
claim on the composed driver itself instead of arguing it stage by
stage. Replicas get a marker token appended (byte-identical replicas
would collapse in stage 1 and the probe would measure nothing), so
the N× corpus is N× DISTINCT docs — the honest scaling load for the
near-dedup posting join and the packing scan alike.

Usage: python tools/stress_corpus_prep.py [N]    (default 10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.plans.corpus_prep import prepare_corpus
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def build_staging(spark, base: str, n: int) -> str:
    stage = tempfile.mkdtemp(prefix="stress_prep_")
    docs = load_table(spark, base, "documents")
    scaled = (
        docs.withColumn("k", F.explode(F.expr(f"sequence(0, {n - 1})")))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("k").cast("long") * 10_000_000,
        )
        .withColumn(
            "text",
            F.when(
                F.col("k") > 0,
                F.concat(
                    F.col("text"), F.lit(" replica"), F.col("k").cast("string")
                ),
            ).otherwise(F.col("text")),
        )
        .drop("k")
    )
    scaled.write.mode("overwrite").parquet(
        os.path.join(stage, "documents.parquet")
    )
    return stage


def run_scale(spark, base: str, n: int) -> dict:
    sf_dir = base if n == 1 else build_staging(spark, base, n)
    out_dir = tempfile.mkdtemp(prefix=f"prep_out_{n}x_")
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    m = prepare_corpus(spark, sf_dir, out_dir)
    sec = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out_dir, ignore_errors=True)
    if n != 1:
        shutil.rmtree(sf_dir, ignore_errors=True)
    return {
        "sec": sec,
        "docs_in": m["docs_in"],
        "docs_out": m["docs_out"],
        "near_dups_removed": m["near_dups_removed"],
        "contaminated_removed": m["contaminated_removed"],
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-corpus-prep")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf": base, "scales": {}}
    for scale in (1, n):
        out["scales"][f"{scale}x"] = run_scale(spark, base, scale)
    s1, sn = out["scales"]["1x"], out["scales"][f"{n}x"]
    out["wall_ratio"] = round(sn["sec"] / max(s1["sec"], 0.01), 1)
    out["data_ratio"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
