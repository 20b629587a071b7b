"""int8-quantization probe: measure what quantize_embeddings buys and
costs on the ANN path as the corpus grows.

What this records:
  * the byte footprint cut (fp32 vs int8+scale) at 1x and Nx corpus —
    the "100 TB of fp32 becomes ~25 TB of codes" claim as numbers;
  * quantize-pass wall time (map-only, zero shuffle — should scale
    linearly with rows and never hit an exchange);
  * ranking retention: exact cosine top-5 per query over the
    RECONSTRUCTED vectors vs over fp32 — recall@5 and the worst
    cosine perturbation over the fp32 winners (the scale/2 bound in
    tests, here measured end-to-end at corpus scale).

Usage: python tools/stress_quantize.py [N]     (default 100)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from irio2024_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    QUANT_LEVELS,
    TOP_K,
    _as_double,
    _cosine,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table_parallel


def scaled_emb(spark, sf_dir: str, n: int):
    """Nx corpus: original vectors plus n-1 shifted-id copies (the
    stress_ann_index convention — queries stay only in the original
    stripe)."""
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    if n == 1:
        return emb
    return emb.withColumn(
        "k", F.explode(F.expr(f"sequence(0, {n - 1})"))
    ).select(
        (F.col("vec_id") + F.col("k").cast("long") * 100_000_000).alias(
            "vec_id"
        ),
        "v",
    )


def quantized(emb):
    """vec_id, reconstructed vector, and the per-row byte payload —
    the same arithmetic as operators.similarity.quantize_vectors,
    applied to the (vec_id, v) probe frame."""
    m = F.array_max(F.transform(F.col("v"), F.abs))
    with_m = emb.withColumn("_m", m)
    code = F.transform(
        F.col("v"),
        lambda x: F.when(
            F.col("_m") > 0,
            F.floor(
                (F.lit(float(QUANT_LEVELS)) * x) / F.col("_m") + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    scale = F.col("_m") / QUANT_LEVELS
    return with_m.select(
        "vec_id",
        F.size("v").alias("dim"),
        F.transform(code, lambda c: c.cast("double") * scale).alias("v"),
    )


def topk(emb):
    """Exact cosine top-K of the corpus stripe for each query vector
    (the similarity_topk shape on an arbitrary (vec_id, v) frame)."""
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    scored = corpus.join(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


def run_scale(spark, sf_dir: str, n: int) -> dict:
    emb = scaled_emb(spark, sf_dir, n).localCheckpoint(eager=True)
    n_vecs = emb.count()

    # quantize pass: map-only wall time + exact byte accounting
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    q = quantized(emb).localCheckpoint(eager=True)
    stats = q.agg(
        F.count("*").alias("n"), F.sum("dim").alias("codes")
    ).collect()[0]
    quant_sec = round(time.perf_counter() - t0, 2)
    bytes_fp32 = int(stats["codes"]) * 4
    bytes_int8 = int(stats["codes"]) + int(stats["n"]) * 8

    fp = {}
    for r in topk(emb).collect():
        fp.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine"]
    rq = {}
    for r in topk(q.select("vec_id", "v")).collect():
        rq.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine"]

    hits = total = 0
    max_cos_diff = 0.0
    for qid, neigh in fp.items():
        got = set(rq.get(qid, {}))
        hits += len(set(neigh) & got)
        total += len(neigh)
        for nid, c in neigh.items():
            if nid in rq.get(qid, {}):
                max_cos_diff = max(max_cos_diff, abs(c - rq[qid][nid]))
    return {
        "n": n,
        "vectors": n_vecs,
        "quantize_sec": quant_sec,
        "bytes_fp32": bytes_fp32,
        "bytes_int8": bytes_int8,
        "compression": round(bytes_fp32 / bytes_int8, 3),
        "recall_at_k_vs_fp32": round(hits / total, 4) if total else None,
        "max_cos_diff_on_fp32_winners": round(max_cos_diff, 6),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    out = {
        "probe": "stress_quantize",
        "sf": sf_dir,
        "scales": [run_scale(spark, sf_dir, 1), run_scale(spark, sf_dir, n)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
