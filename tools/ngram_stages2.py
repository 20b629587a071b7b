"""Finer decomposition inside the posting-cap step: explode alone,
explode+sizes agg, the admission join with/without hint, and the
whole cap with a checkpointed input (single execution of upstream).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import (
    NGRAM_POSTING_CAP,
    PAIRWISE_BLOCK_CAP,
    _cap_blocks_lowcard,
    _shingles,
    _tokens,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def bench(label, fn, spark, iters=3):
    walls = []
    for _ in range(iters):
        drain_driver_backlog(spark)
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        walls.append(time.perf_counter() - t0)
    print(f"{label:40s} walls={[round(w,2) for w in walls]} min={min(walls):.2f}", flush=True)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ngram-stages2", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n = spark.sparkContext.defaultParallelism

    def docs():
        raw = load_table(spark, sf, "documents")
        d = raw.groupBy(F.sha2("text", 256).alias("_h")).agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        ).repartition(n).select(
            "doc_id",
            _shingles().alias("shingles"),
            (F.size(_tokens()) / 8).cast("long").alias("len_band"),
        )
        return _cap_blocks_lowcard(d, ["len_band"], PAIRWISE_BLOCK_CAP)

    def posting():
        return docs().select(
            "doc_id", "len_band", F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("sh"),
        )

    def sizes_only():
        return (
            posting().groupBy("len_band", "sh")
            .agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") <= NGRAM_POSTING_CAP)
            .select("len_band", "sh")
        )

    def cap_hint():
        p = posting()
        s = (
            p.groupBy("len_band", "sh").agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") <= NGRAM_POSTING_CAP).select("len_band", "sh")
        )
        return p.join(s.hint("shuffle_hash"), ["len_band", "sh"], "inner")

    def cap_nohint():
        p = posting()
        s = (
            p.groupBy("len_band", "sh").agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") <= NGRAM_POSTING_CAP).select("len_band", "sh")
        )
        return p.join(s, ["len_band", "sh"], "inner")

    def cap_ckpt_input():
        p = posting().localCheckpoint(eager=False)
        s = (
            p.groupBy("len_band", "sh").agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") <= NGRAM_POSTING_CAP).select("len_band", "sh")
        )
        return p.join(s.hint("shuffle_hash"), ["len_band", "sh"], "inner")

    def cap_window():
        # window-based cap for measurement only (NOT scale-safe)
        from pyspark.sql import Window
        p = posting()
        w = Window.partitionBy("len_band", "sh")
        return (
            p.withColumn("_bsz", F.count("*").over(w))
            .filter(F.col("_bsz") <= NGRAM_POSTING_CAP)
            .drop("_bsz")
        )

    bench("posting (explode only)", posting, spark)
    bench("sizes agg only", sizes_only, spark)
    bench("cap join (shuffle_hash hint)", cap_hint, spark)
    bench("cap join (no hint)", cap_nohint, spark)
    bench("cap join (ckpt input)", cap_ckpt_input, spark)
    bench("cap via window (measure only)", cap_window, spark)


if __name__ == "__main__":
    main()
