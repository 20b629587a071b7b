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
    _ann_corpus_rows,
    _ann_join_score,
    _ann_query_probes,
    _ann_sigs,
    _as_double,
    _cosine,
    quant_abs_max,
    quant_code_col,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table_parallel


def scaled_emb(spark, sf_dir: str, n: int):
    """Nx corpus: queries (vec_id < N_QUERIES) stay EXACTLY 1x; the
    corpus stripe is exploded n-1 extra times with a small
    deterministic per-(copy, dim) multiplicative perturbation
    (±1.2 %) so every copy is a UNIQUE vector. Two prior hazards this
    kills: exploding queries floods the corpus with cosine-1.0 copies
    of every query, making recall trivially perfect; and exact
    unperturbed copies make the fp32-vs-int8 ranking comparison
    degenerate (both sides rank identical values identically). With
    unique copies the Nx recall row is a real measurement — the
    quantization noise (≤ scale/2 per element) competes with genuine
    ~1 % cosine gaps."""
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    if n == 1:
        return emb
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    copies = corpus.withColumn(
        "k", F.explode(F.expr(f"sequence(0, {n - 1})"))
    ).select(
        (F.col("vec_id") + F.col("k").cast("long") * 100_000_000).alias(
            "vec_id"
        ),
        # modulus 101 > any default n: (k*37 + i*17) mod 101 never
        # repeats across copies k of one base vector (37 is coprime
        # to 101), so every copy really IS unique — a small modulus
        # (an earlier 7) made copies k and k+7 bit-identical and
        # quietly re-introduced the exact-duplicate degeneracy
        F.when(F.col("k") == 0, F.col("v"))
        .otherwise(
            F.transform(
                F.col("v"),
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + F.lit(0.00024)
                    * (
                        (F.col("k") * 37 + i * 17) % 101 - F.lit(50)
                    ).cast("double")
                ),
            )
        )
        .alias("v"),
    )
    return queries.unionByName(copies)


def quantized(emb):
    """vec_id, reconstructed vector, and the per-row dim — built from
    the operator's OWN code expression (quant_code_col), so the probe
    can never drift from what quantize_vectors ships."""
    with_m = emb.withColumn("_m", quant_abs_max(F.col("v")))
    code = quant_code_col(F.col("v"), F.col("_m"))
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

    # recall@k is ILL-CONDITIONED when candidates tie within the
    # quantization noise (at Nx the top slots are ±1.2%-perturbed
    # variants separated by <1e-3 cosine) — so also measure REGRET:
    # how much TRUE (fp32) cosine a user loses by taking int8's picks
    # instead of fp32's. Near-zero regret with low recall means the
    # picks differ in identity, not in quality.
    need = set()
    for qid in fp:
        need.update(fp[qid])
        need.update(rq.get(qid, {}))
        need.add(qid)
    vecs = {
        r["vec_id"]: list(r["v"])
        for r in emb.filter(F.col("vec_id").isin(list(need))).collect()
    }

    def true_cos(a, b):
        va, vb = vecs[a], vecs[b]
        num = da = db = 0.0
        for x, y in zip(va, vb):
            num += x * y
            da += x * x
            db += y * y
        return num / (da**0.5 * db**0.5) if da > 0 and db > 0 else 0.0

    hits = total = 0
    max_cos_diff = 0.0
    regret_sum = 0.0
    for qid, neigh in fp.items():
        got = set(rq.get(qid, {}))
        hits += len(set(neigh) & got)
        total += len(neigh)
        for nid, c in neigh.items():
            if nid in rq.get(qid, {}):
                max_cos_diff = max(max_cos_diff, abs(c - rq[qid][nid]))
        fp_gain = sum(true_cos(qid, nid) for nid in neigh)
        q8_gain = sum(true_cos(qid, nid) for nid in got)
        regret_sum += max(0.0, fp_gain - q8_gain) / max(len(neigh), 1)
    return {
        "n": n,
        "vectors": n_vecs,
        "quantize_sec": quant_sec,
        "bytes_fp32": bytes_fp32,
        "bytes_int8": bytes_int8,
        "compression": round(bytes_fp32 / bytes_int8, 3),
        "recall_at_k_vs_fp32": round(hits / total, 4) if total else None,
        "max_cos_diff_on_fp32_winners": round(max_cos_diff, 6),
        "mean_true_cos_regret_per_slot": round(
            regret_sum / max(len(fp), 1), 6
        ),
    }


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def run_quantized_index(spark, sf_dir: str) -> dict:
    """The deployment composition: the stored ANN index carries int8
    CODES instead of vectors; a probe reconstructs to score, keeps a
    2k candidate pool per query, then re-ranks that pool with fp32
    fetched by id — and the final answers must EQUAL the fp32
    on-the-fly ANN path. The fp32 comparison index stores
    array<float> (what a real fp32 index holds — comparing against
    array<double> would double the baseline and flatter the codes);
    codes are array<tinyint>.

    Byte accounting is done TWO ways because each alone misleads at
    fixture scale: the partitioned index spreads 8 000 rows over
    ~4 000 bucket dirs, so parquet footers dominate BOTH variants
    (the partitioned ratio is near 1 and means nothing about
    payload); the flat single-file ratio on the UNIQUE 1x vectors is
    the honest payload number (~3.45x here; the Nx explode can't be
    used for bytes at all — its duplicate pages compress away under
    either type). At production scale buckets hold MBs, so the flat
    ratio is the one that transfers.
    """
    import tempfile

    emb = scaled_emb(spark, sf_dir, 1).localCheckpoint(eager=True)
    sigs = _ann_sigs(emb)
    corpus = _ann_corpus_rows(sigs)  # neighbor_id, cv, tbl, cb
    queries = _ann_query_probes(sigs)

    fly = sorted(
        tuple(r) for r in _ann_join_score(corpus, queries).collect()
    )

    fp32_dir = tempfile.mkdtemp(prefix="ann_fp32_")
    corpus.select(
        "neighbor_id",
        "tbl",
        "cb",
        F.transform("cv", lambda x: x.cast("float")).alias("cv"),
    ).write.mode("overwrite").partitionBy("tbl", "cb").parquet(fp32_dir)

    int8_dir = tempfile.mkdtemp(prefix="ann_int8_")
    qcorpus = corpus.withColumn(
        "_m", quant_abs_max(F.col("cv"))
    ).select(
        "neighbor_id",
        "tbl",
        "cb",
        (F.col("_m") / QUANT_LEVELS).alias("scale"),
        quant_code_col(F.col("cv"), F.col("_m"), "byte").alias("codes"),
    )
    qcorpus.write.mode("overwrite").partitionBy("tbl", "cb").parquet(
        int8_dir
    )

    # flat single-file payload comparison on the unique vectors
    flat32, flat8 = (
        tempfile.mkdtemp(prefix="flat32_"),
        tempfile.mkdtemp(prefix="flat8_"),
    )
    corpus.select(
        "neighbor_id",
        F.transform("cv", lambda x: x.cast("float")).alias("cv"),
    ).dropDuplicates(["neighbor_id"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(flat32)
    qcorpus.select("neighbor_id", "scale", "codes").dropDuplicates(
        ["neighbor_id"]
    ).coalesce(1).write.mode("overwrite").parquet(flat8)

    # probe the quantized index: reconstruct -> approx-score -> keep a
    # 2k pool per query -> fp32 re-rank by id
    stored = spark.read.parquet(int8_dir).select(
        "neighbor_id",
        F.col("tbl").cast("int").alias("tbl"),
        F.col("cb").cast("long").alias("cb"),
        F.transform(
            "codes", lambda c: c.cast("double") * F.col("scale")
        ).alias("rv"),
    )
    cand = (
        stored.join(
            F.broadcast(queries),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("cb") == F.col("probe")),
        )
        .select("query_id", "neighbor_id", "qv", "rv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("acos"), F.asc("neighbor_id")
    )
    pool = (
        cand.withColumn(
            "acos", F.round(_cosine(F.col("qv"), F.col("rv")), 6)
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 2 * TOP_K)
        .select("query_id", "neighbor_id", "qv")
    )
    fp32_vec = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv32")
    )
    rerank = pool.join(fp32_vec, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("cv32")), 6).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    final = sorted(
        tuple(r)
        for r in rerank.withColumn(
            "rank", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .collect()
    )
    assert final == fly, "quantized-index + fp32 re-rank diverges from fp32 ANN"
    b32, b8 = _du(fp32_dir), _du(int8_dir)
    f32, f8 = _du(flat32), _du(flat8)
    return {
        "partitioned_index_bytes_fp32": b32,
        "partitioned_index_bytes_int8": b8,
        "partitioned_ratio_metadata_dominated": round(b32 / b8, 3),
        "flat_payload_bytes_fp32": f32,
        "flat_payload_bytes_int8": f8,
        "flat_payload_ratio": round(f32 / f8, 3),
        "answers_equal_fp32_ann": True,
        "rerank_pool_per_query": 2 * TOP_K,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    out = {
        "probe": "stress_quantize",
        "sf": sf_dir,
        "scales": [run_scale(spark, sf_dir, 1), run_scale(spark, sf_dir, n)],
        "quantized_stored_index": run_quantized_index(spark, sf_dir),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
