"""Interleaved in-session A/B for the r14 batch-2 candidates.

Same protocol as tools/ab_r14_batch1.py (host drifts 1.5-2x between
runs, so both arms alternate inside ONE session; result-hash parity
at sf0.01 gates the timing):

* ``incr``: dedup_incremental with the corpus collapse built TWICE
  (separate corpus_index_hashes scan+distinct and
  corpus_index_postings collapse — the batch-1 shape) vs ONE shared
  collapse checkpoint serving both index halves
  (reps.select('_h') IS the distinct-md5 set).
* ``ngram``: dedup_ngram_jaccard with the collapse re-instantiated
  per cap consumer (batch-1 shape: the low-card band cap and the
  posting cap each evaluate the collapse subtree again) vs a lazy
  localCheckpoint on the collapse reps so the corpus
  scan+shuffle+sort-agg runs once.

Usage: python tools/ab_r14_batch2.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from irio2024_mapreduce_spark.operators import dedup as D
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def incr_twopass(spark, sf):
    docs = load_table(spark, sf, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 9)
    corpus = docs.filter(F.col("doc_id") % 10 != 9)
    return D._incremental_verdicts(
        batch,
        D.corpus_index_hashes(corpus),
        D.corpus_index_postings(corpus),
        recap_stored=False,
    )


def incr_shared(spark, sf):
    docs = load_table(spark, sf, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 9)
    corpus = docs.filter(F.col("doc_id") % 10 != 9)
    reps = (
        corpus.repartition(
            spark.sparkContext.defaultParallelism, F.md5("text")
        )
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
        .localCheckpoint(eager=False)
    )
    return D._incremental_verdicts(
        batch,
        reps.select("_h"),
        D._side_postings(reps, respread=False),
        recap_stored=False,
    )


def _ngram_tail(docs_capped: DataFrame) -> DataFrame:
    """Shingle projection + posting join + jaccard — shared tail so
    the two arms differ ONLY in collapse materialization."""
    docs = docs_capped.select(
        "doc_id",
        D._shingles_from(F.col("_toks")).alias("shingles"),
        "len_band",
    )
    posting = docs.select(
        "doc_id",
        "len_band",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("sh"),
    )
    posting = D._cap_buckets(posting, ["len_band", "sh"], D.NGRAM_POSTING_CAP)
    posting = posting.localCheckpoint(eager=False)
    l, r = posting.alias("l"), posting.alias("r")
    shared = (
        l.join(
            r,
            (F.col("l.len_band") == F.col("r.len_band"))
            & (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.n_sh").alias("n_a"),
            F.col("r.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def _ngram_docs(spark, sf, ckpt_reps: bool) -> DataFrame:
    raw = load_table(spark, sf, "documents")
    reps = (
        raw.repartition(
            spark.sparkContext.defaultParallelism, F.sha2("text", 256)
        )
        .groupBy(F.sha2("text", 256).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
    )
    if ckpt_reps:
        reps = reps.localCheckpoint(eager=False)
    docs = reps.withColumn("_toks", D._tokens()).select(
        "doc_id",
        "_toks",
        (F.size("_toks") / 8).cast("long").alias("len_band"),
    )
    return D._cap_blocks_lowcard(docs, ["len_band"], D.PAIRWISE_BLOCK_CAP)


def ngram_nockpt(spark, sf):
    return _ngram_tail(_ngram_docs(spark, sf, False))


def ngram_ckpt(spark, sf):
    return _ngram_tail(_ngram_docs(spark, sf, True))


def result_hash(df: DataFrame) -> str:
    rows = sorted(str(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--parity-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    fams = [
        ("incr", incr_twopass, incr_shared),
        ("ngram", ngram_nockpt, ngram_ckpt),
    ]

    spark = get_spark(
        "ab-r14-b2", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"== parity at {args.parity_sf} ==", flush=True)
    for name, old, new in fams:
        ho = result_hash(old(spark, args.parity_sf))
        hn = result_hash(new(spark, args.parity_sf))
        print(
            ("OK " if ho == hn else "MISMATCH")
            + f" {name:8s} old={ho} new={hn}",
            flush=True,
        )
        assert ho == hn, name

    print(f"== interleaved timing at {args.sf} ({args.rounds} rounds) ==")
    for name, old, new in fams:
        olds, news = [], []
        for _ in range(args.rounds):
            for arm, fn in (("old", old), ("new", new)):
                drain_driver_backlog(spark)
                t0 = time.perf_counter()
                fn(spark, args.sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                (olds if arm == "old" else news).append(
                    time.perf_counter() - t0
                )
        print(
            f"{name:8s} old={[round(w, 2) for w in olds]} "
            f"new={[round(w, 2) for w in news]} "
            f"min {min(olds):.2f} -> {min(news):.2f}  "
            f"med {sorted(olds)[len(olds)//2]:.2f} -> "
            f"{sorted(news)[len(news)//2]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
