"""Incremental-dedup scale probe: does the daily increment stay
batch-sized as the corpus grows?

Setup: the batch stripe (doc_id % 10 == 9 of sf0.1, ~500 docs) is
held FIXED while the corpus (the other 90%) is replicated N×
(shifted ids preserve the stripe split: shifts are multiples of 10).
Three measurements at each scale:

  * ``on_the_fly`` — :func:`dedup_incremental`'s shape: the corpus
    md5 set and posting index are derived from corpus text inside
    the query. Expected to grow ~linearly with the corpus — this is
    the checkability form, not the production form.
  * ``index_build`` — the one-time ingest cost: materialize the
    corpus index (hashes + capped postings) to parquet. Amortized
    over every future increment; in production it's appended, not
    rebuilt.
  * ``increment_with_index`` — the production daily path: admission
    verdicts for the fixed batch against the STORED index. This is
    the number that must stay ~flat as the corpus grows (it reads
    only index rows that hash-join against the batch's keys).

Verdict parity between on_the_fly and the index path is asserted at
every scale before timing.

Usage: python tools/stress_incremental.py [N]   (default 30)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import (
    _incremental_verdicts,
    corpus_index_hashes,
    corpus_index_postings,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def build_staging(spark, base: str, n: int) -> str:
    """documents.parquet with the corpus replicated n× (id shifts are
    multiples of 10, so replicas keep their stripe) and the batch
    stripe kept at 1×."""
    stage = tempfile.mkdtemp(prefix="stress_inc_")
    docs = load_table(spark, base, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 9)
    batch = docs.filter(F.col("doc_id") % 10 == 9)
    scaled_corpus = (
        corpus.withColumn("k", F.explode(F.expr(f"sequence(0, {n - 1})")))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("k").cast("long") * 10_000_000,
        )
        # make every replica a DISTINCT document (append a replica
        # marker token): byte-identical replicas would collapse to
        # the same md5 rep and the index wouldn't grow at all — the
        # honest 100× corpus is 100× distinct docs, growing the
        # posting index ~linearly, which is exactly the re-scan the
        # stored-index increment must avoid
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
    scaled_corpus.unionByName(batch).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "documents.parquet"))
    return stage


def timed(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--decontam":
        decontam_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 30)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--lsh":
        lsh_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 30)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-incremental")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for label, scale in [("1x", 1), (f"{n}x", n)]:
        stage = build_staging(spark, base, scale) if scale > 1 else base
        docs = load_table(spark, stage, "documents")
        batch = docs.filter(F.col("doc_id") % 10 == 9)
        corpus = docs.filter(F.col("doc_id") % 10 != 9)

        idx = tempfile.mkdtemp(prefix="inc_idx_")
        hp, pp = os.path.join(idx, "hashes"), os.path.join(idx, "postings")

        def on_the_fly():
            _incremental_verdicts(
                batch,
                corpus_index_hashes(corpus),
                corpus_index_postings(corpus),
            ).write.mode("overwrite").format("noop").save()

        def index_build():
            corpus_index_hashes(corpus).write.mode("overwrite").parquet(hp)
            corpus_index_postings(corpus).write.mode("overwrite").parquet(pp)

        def with_index():
            _incremental_verdicts(
                batch, spark.read.parquet(hp), spark.read.parquet(pp)
            ).write.mode("overwrite").format("noop").save()

        # parity before timing (index_build also warms the index)
        index_build()
        a = sorted(
            map(
                tuple,
                _incremental_verdicts(
                    batch,
                    corpus_index_hashes(corpus),
                    corpus_index_postings(corpus),
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                _incremental_verdicts(
                    batch, spark.read.parquet(hp), spark.read.parquet(pp)
                ).collect(),
            )
        )
        assert a == b and len(a) > 0

        drain_driver_backlog(spark)
        out[label] = {
            "batch_rows": batch.count(),
            "corpus_rows": corpus.count(),
            "on_the_fly": timed(on_the_fly),
            "index_build_once": timed(index_build),
            "increment_with_index": timed(with_index),
        }
    big, small = out[f"{n}x"], out["1x"]
    big["on_the_fly_ratio"] = round(
        big["on_the_fly"] / max(small["on_the_fly"], 0.01), 1
    )
    big["increment_ratio"] = round(
        big["increment_with_index"]
        / max(small["increment_with_index"], 0.01),
        1,
    )
    print(json.dumps({"scale": n, "results": out}))


def lsh_probe(n: int) -> None:
    """--lsh mode: the MinHash/LSH incremental family under the same
    protocol as the n-gram default — batch stripe fixed, corpus grown
    N× with DISTINCT replicas, on-the-fly vs stored-band-index parity
    asserted at each scale before timing. The production daily path
    probes the stored (band, band_hash)-keyed index plus doc_id-keyed
    rep shingles; its cost must stay ~batch-sized."""
    from irio2024_mapreduce_spark.operators.dedup import (
        _incremental_lsh_verdicts,
        corpus_index_bands,
        corpus_index_rep_shingles,
    )

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-incremental-lsh")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for label, scale in [("1x", 1), (f"{n}x", n)]:
        stage = build_staging(spark, base, scale) if scale > 1 else base
        docs = load_table(spark, stage, "documents")
        batch = docs.filter(F.col("doc_id") % 10 == 9)
        corpus = docs.filter(F.col("doc_id") % 10 != 9)

        idx = tempfile.mkdtemp(prefix="inc_lsh_idx_")
        hp = os.path.join(idx, "hashes")
        bp = os.path.join(idx, "bands")
        sp = os.path.join(idx, "shingles")

        def on_the_fly():
            _incremental_lsh_verdicts(
                batch,
                corpus_index_hashes(corpus),
                corpus_index_bands(corpus),
                corpus_index_rep_shingles(corpus),
            ).write.mode("overwrite").format("noop").save()

        def index_build():
            corpus_index_hashes(corpus).write.mode("overwrite").parquet(hp)
            corpus_index_bands(corpus).write.mode("overwrite").parquet(bp)
            corpus_index_rep_shingles(corpus).write.mode(
                "overwrite"
            ).parquet(sp)

        def with_index():
            _incremental_lsh_verdicts(
                batch,
                spark.read.parquet(hp),
                spark.read.parquet(bp),
                spark.read.parquet(sp),
            ).write.mode("overwrite").format("noop").save()

        index_build()
        a = sorted(
            map(
                tuple,
                _incremental_lsh_verdicts(
                    batch,
                    corpus_index_hashes(corpus),
                    corpus_index_bands(corpus),
                    corpus_index_rep_shingles(corpus),
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                _incremental_lsh_verdicts(
                    batch,
                    spark.read.parquet(hp),
                    spark.read.parquet(bp),
                    spark.read.parquet(sp),
                ).collect(),
            )
        )
        assert a == b and len(a) > 0

        drain_driver_backlog(spark)
        out[label] = {
            "batch_rows": batch.count(),
            "corpus_rows": corpus.count(),
            "on_the_fly": timed(on_the_fly),
            "index_build_once": timed(index_build),
            "increment_with_index": timed(with_index),
        }
    big, small = out[f"{n}x"], out["1x"]
    big["on_the_fly_ratio"] = round(
        big["on_the_fly"] / max(small["on_the_fly"], 0.01), 1
    )
    big["increment_ratio"] = round(
        big["increment_with_index"]
        / max(small["increment_with_index"], 0.01),
        1,
    )
    print(json.dumps({"mode": "lsh", "scale": n, "results": out}))


def decontam_probe(n: int) -> None:
    """--decontam mode: benchmark stripe fixed, training corpus grown
    N× with distinct replicas — the broadcast-semi-join topology
    means the training side is ONE map pass, so wall time should
    scale ~linearly in corpus (it reads every doc once) with no
    shuffle growth at all. Reported alongside the n-gram volume."""
    import json as _json

    from irio2024_mapreduce_spark.operators.llm_prep import decontaminate

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-decontam")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, scale in [("1x", 1), (f"{n}x", n)]:
        if scale == 1:
            stage = base
        else:
            # reuse the incremental builder: replicates the %10!=9
            # stripes (which includes the %10==8 benchmark... so
            # filter replicas of the benchmark stripe out to keep the
            # eval set fixed)
            import shutil

            stage = build_staging(spark, base, scale)
            docs = load_table(spark, stage, "documents")
            docs.filter(
                (F.col("doc_id") % 10 != 8) | (F.col("doc_id") < 10_000_000)
            ).repartition(32).write.mode("overwrite").parquet(
                os.path.join(stage, "documents2.parquet")
            )
            shutil.rmtree(os.path.join(stage, "documents.parquet"))
            os.rename(
                os.path.join(stage, "documents2.parquet"),
                os.path.join(stage, "documents.parquet"),
            )
        def run():
            decontaminate(spark, stage).write.mode("overwrite").format(
                "noop"
            ).save()
        run()
        drain_driver_backlog(spark)
        t0 = time.perf_counter()
        run()
        out[label] = {
            "sec": round(time.perf_counter() - t0, 2),
            "docs": load_table(spark, stage, "documents").count(),
        }
    out["ratio"] = round(out[f"{n}x"]["sec"] / max(out["1x"]["sec"], 0.01), 1)
    print(_json.dumps({"mode": "decontam", "scale": n, "results": out}))


if __name__ == "__main__":
    main()
