"""A/B variants of the dedup_ngram_jaccard pipeline shape, timed
with the noop sink (guide §1.4) — measures which structural pieces
(round-robin repartition, lazy localCheckpoint, persist) cost what at
sf0.1. Results must be identical across variants (checked by sorted
collect hash)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

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


def posting_base(spark, sf_dir, repart: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    docs = raw.groupBy(F.sha2("text", 256).alias("_h")).agg(
        F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
    )
    n = spark.sparkContext.defaultParallelism
    if repart == "rr":
        docs = docs.repartition(n)
    elif repart == "hash":
        docs = docs.select("doc_id", "text").repartition(n, "doc_id")
    elif repart == "none":
        docs = docs.select("doc_id", "text")
    docs = docs.select(
        "doc_id",
        _shingles().alias("shingles"),
        (F.size(_tokens()) / 8).cast("long").alias("len_band"),
    )
    docs = _cap_blocks_lowcard(docs, ["len_band"], PAIRWISE_BLOCK_CAP)
    posting = docs.select(
        "doc_id",
        "len_band",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("sh"),
    )
    return _cap_buckets(posting, ["len_band", "sh"], NGRAM_POSTING_CAP)


def pairs_from_posting(posting: DataFrame) -> DataFrame:
    l, r = posting.alias("l"), posting.alias("r")
    joined = l.join(
        r,
        (F.col("l.len_band") == F.col("r.len_band"))
        & (F.col("l.sh") == F.col("r.sh"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    )
    shared = joined.groupBy(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
        F.col("l.n_sh").alias("n_a"),
        F.col("r.n_sh").alias("n_b"),
    ).agg(F.count("*").alias("n_shared"))
    return shared.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.5)


def build(spark, sf_dir, repart: str, mat: str) -> DataFrame:
    posting = posting_base(spark, sf_dir, repart)
    if mat == "ckpt":
        posting = posting.localCheckpoint(eager=False)
    elif mat == "persist":
        posting = posting.persist()
    return pairs_from_posting(posting)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ngram-variants", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext

    variants = [
        ("rr_ckpt(current)", "rr", "ckpt"),
        ("rr_none", "rr", "none"),
        ("rr_persist", "rr", "persist"),
        ("hash_ckpt", "hash", "ckpt"),
        ("hash_none", "hash", "none"),
        ("none_none", "none", "none"),
        ("hash_persist", "hash", "persist"),
    ]
    ref_hash = None
    for label, repart, mat in variants:
        walls = []
        jobs0 = None
        for it in range(4):
            drain_driver_backlog(spark)
            t0 = time.perf_counter()
            df = build(spark, sf, repart, mat)
            df.write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            if mat == "persist":
                spark.catalog.clearCache()
        # correctness: same rows
        df = build(spark, sf, repart, mat)
        rows = sorted(map(str, df.collect()))
        h = hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]
        if mat == "persist":
            spark.catalog.clearCache()
        if ref_hash is None:
            ref_hash = h
        ok = "OK " if h == ref_hash else "MISMATCH"
        print(
            f"{label:18s} walls={[round(w, 2) for w in walls]} "
            f"min={min(walls):.2f} rows={len(rows)} {ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
