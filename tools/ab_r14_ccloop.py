"""Interleaved A/B: old CC loop (convergence counted on the post-jump
labels) vs new (convergence counted on the propagation half, final
round skips the jump join + checkpoint). Both arms run in ONE session,
alternated, so host drift hits both. Result-hash parity is asserted
every round before timing is trusted.

Usage: python tools/ab_r14_ccloop.py [--sf /root/testdata/sf0.1] [--rounds 4]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators import chunking, dedup
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


def old_clusters(spark, sf_dir):
    """The pre-r14-opt loop shape, reconstructed from git HEAD
    (convergence on new_labels, jump every round)."""
    near_pairs = dedup.dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    docs_raw = load_table(spark, sf_dir, "documents")
    hashed = docs_raw.select(
        "doc_id", F.sha2("text", 256).alias("_h")
    ).localCheckpoint(eager=False)
    reps = hashed.groupBy("_h").agg(F.min("doc_id").alias("rep"))
    doc_rep = hashed.join(reps, "_h").select("doc_id", "rep")
    pairs = near_pairs
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=False)
    members = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = members.select("doc_id", F.col("doc_id").alias("label"))
    converged = False
    stale = []
    for _round in range(chunking.MAX_CC_ITERATIONS):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("neighbor_label"))
        )
        half = (
            labels.join(
                neighbor_min, labels.doc_id == neighbor_min.src, "left"
            )
            .select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"),
                    F.coalesce("neighbor_label", F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        jump = half.select(
            F.col("doc_id").alias("jdoc"), F.col("label").alias("jlabel")
        )
        new_labels = (
            half.join(jump, half.label == jump.jdoc, "left")
            .select(
                "doc_id",
                "_old",
                F.least(
                    F.col("label"), F.coalesce("jlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        for dead in [*stale, chunking._ckpt_rdd(half)]:
            dead.unpersist(False)
        stale = [chunking._ckpt_rdd(new_labels)]
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            converged = True
            chunking._ckpt_rdd(edges).unpersist(False)
            break
    assert converged
    rep_labels = labels.select(F.col("doc_id").alias("rep"), "label")
    doc_labels = doc_rep.join(rep_labels, "rep", "left").select(
        "doc_id", F.coalesce("label", F.col("rep")).alias("label")
    )
    per_cluster = doc_labels.groupBy("label").agg(
        F.count("*").alias("cluster_size"),
        F.min("doc_id").alias("canonical_doc"),
    )
    return (
        per_cluster.select("canonical_doc", "cluster_size")
        .groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            F.min("canonical_doc").alias("min_canonical"),
        )
        .orderBy("cluster_size")
    )


def run_hash(df):
    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()

    h_old = run_hash(old_clusters(spark, args.sf))
    h_new = run_hash(chunking.dedup_clusters(spark, args.sf))
    assert h_old == h_new, ("parity failure", h_old, h_new)
    print("parity OK:", h_new)

    walls = {"old": [], "new": []}
    for _ in range(args.rounds):
        for arm, fn in (
            ("old", old_clusters),
            ("new", chunking.dedup_clusters),
        ):
            drain_driver_backlog(spark)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            walls[arm].append(round(time.perf_counter() - t0, 3))
            print(arm, walls[arm][-1], flush=True)
    out = {
        arm: {"walls": w, "min": min(w), "median": sorted(w)[len(w) // 2]}
        for arm, w in walls.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
