"""Decompose the dedup_ngram_jaccard posting subtree stage by stage
(noop sink per piece), and A/B the shingle expression: split(text)
inlined in the transform lambda (current — re-splits per shingle)
vs a pre-materialized token-array column (split once per doc)."""

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
    _cap_buckets,
    _shingles,
    _tokens,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def _shingles_pre(toks_col, n: int = 3):
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks_col) - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i, n)),
        )
    )


def bench(label, fn, spark, iters=3):
    walls = []
    for _ in range(iters):
        drain_driver_backlog(spark)
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        walls.append(time.perf_counter() - t0)
    print(f"{label:34s} walls={[round(w,2) for w in walls]} min={min(walls):.2f}", flush=True)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ngram-stages", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n = spark.sparkContext.defaultParallelism

    def collapse():
        raw = load_table(spark, sf, "documents")
        return raw.groupBy(F.sha2("text", 256).alias("_h")).agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        )

    def repart():
        return collapse().repartition(n)

    def shingled_inline():
        return repart().select(
            "doc_id",
            _shingles().alias("shingles"),
            (F.size(_tokens()) / 8).cast("long").alias("len_band"),
        )

    def shingled_pre():
        d = repart().withColumn("_toks", F.split("text", " "))
        return d.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("_toks") - 2, F.lit(1)),
                    ),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, 3)),
                )
            ).alias("shingles"),
            (F.size("_toks") / 8).cast("long").alias("len_band"),
        )

    def posting(sh_fn):
        docs = _cap_blocks_lowcard(sh_fn(), ["len_band"], PAIRWISE_BLOCK_CAP)
        p = docs.select(
            "doc_id", "len_band", F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("sh"),
        )
        return _cap_buckets(p, ["len_band", "sh"], NGRAM_POSTING_CAP)

    bench("collapse", collapse, spark)
    bench("collapse+repartition", repart, spark)
    bench("+shingles (inline split)", shingled_inline, spark)
    bench("+shingles (pre-split toks)", shingled_pre, spark)
    bench("+explode+caps (inline)", lambda: posting(shingled_inline), spark)
    bench("+explode+caps (pre-split)", lambda: posting(shingled_pre), spark)

    # parity check
    a = sorted(map(str, shingled_inline().collect()))
    b = sorted(map(str, shingled_pre().collect()))
    print("shingle parity:", "OK" if a == b else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
