"""Stored-ANN-index probe: materialize similarity_ann's corpus band
rows partitioned by (tbl, cb) — the layout the operator's docstring
promises at 100 TB ("written once, partitioned by (table, sig)") —
then answer the query set by POINT-READING only the probed buckets,
and assert parity with the on-the-fly path at 1× and N× corpus.

What this proves (VERDICT r7 item 5):
  * the index layout works: partition dirs are the buckets, a probe
    is a path list, no scan of unprobed buckets;
  * stored and on-the-fly answers are IDENTICAL (sorted-row equality)
    at both scales;
  * the touched fraction: probed-and-present buckets / total buckets
    and rows-read / corpus-rows — the number that shrinks the probe
    cost below a corpus scan.

Usage: python tools/stress_ann_index.py [N]     (default 100)
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

from irio2024_mapreduce_spark.operators.ann_index import (
    build_ann_index,
    probe_ann_index,
    read_ann_manifest,
    resize_ann_index,
)
from irio2024_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    _ann_corpus_rows,
    _ann_join_score,
    _ann_query_probes,
    _ann_sigs,
    _ann_topk,
    _as_double,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table_parallel


def scaled_emb(spark, sf_dir: str, n: int):
    """N× corpus: the original vectors plus n−1 shifted-id copies.
    Queries (vec_id < N_QUERIES) exist only in the original stripe;
    copies land in the corpus side (shift ≥ N_QUERIES always)."""
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


def probe_stored(spark, idx_dir: str, queries_df) -> tuple:
    """Answer the query set from the stored index: collect the
    (bounded, ≤ queries × tables × probes ≈ 880-row) probe-bucket
    list, point-read exactly those partition dirs, and run the shared
    join+score+topk. Returns (result_df, buckets_probed_present,
    rows_read)."""
    pairs = {
        (r["qtbl"], r["probe"])
        for r in queries_df.select("qtbl", "probe").distinct().collect()
    }
    paths = [
        os.path.join(idx_dir, f"tbl={t}", f"cb={b}")
        for t, b in sorted(pairs)
        if os.path.isdir(os.path.join(idx_dir, f"tbl={t}", f"cb={b}"))
    ]
    stored = (
        spark.read.option("basePath", idx_dir)
        .parquet(*paths)
        .select(
            "neighbor_id",
            "cv",
            F.col("tbl").cast("int").alias("tbl"),
            F.col("cb").cast("long").alias("cb"),
        )
    )
    rows_read = stored.count()
    return _ann_join_score(stored, queries_df), len(paths), rows_read


def run_scale(spark, sf_dir: str, n: int) -> dict:
    emb = scaled_emb(spark, sf_dir, n).localCheckpoint(eager=True)
    corpus_rows = emb.filter(F.col("vec_id") >= N_QUERIES).count()

    # on-the-fly reference
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    fly = [tuple(r) for r in _ann_topk(emb).collect()]
    fly_sec = round(time.perf_counter() - t0, 2)

    # write the index once, partitioned by (tbl, cb)
    idx_dir = tempfile.mkdtemp(prefix=f"ann_idx_{n}x_")
    sigs = _ann_sigs(emb)
    t0 = time.perf_counter()
    _ann_corpus_rows(sigs).write.mode("overwrite").partitionBy(
        "tbl", "cb"
    ).parquet(idx_dir)
    write_sec = round(time.perf_counter() - t0, 2)
    total_buckets = sum(
        1
        for t in os.listdir(idx_dir)
        if t.startswith("tbl=")
        for _ in os.listdir(os.path.join(idx_dir, t))
    )
    index_rows = spark.read.parquet(idx_dir).count()

    # probe it
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    res, buckets_probed, rows_read = probe_stored(
        spark, idx_dir, _ann_query_probes(sigs)
    )
    stored_rows = [tuple(r) for r in res.collect()]
    probe_sec = round(time.perf_counter() - t0, 2)

    assert sorted(stored_rows) == sorted(fly), (
        f"stored-index answers diverge from on-the-fly at {n}x"
    )

    # AFTER AUTO-RESIZE (r9 verdict item 2): same corpus through the
    # first-class operator — built at the shipped 8 bits, then the
    # maintenance pass re-sizes H to the sizing rule. The probe is
    # measured again and parity re-asserted against on-the-fly AT THE
    # RESIZED WIDTH.
    idx2 = tempfile.mkdtemp(prefix=f"ann_idx_resized_{n}x_")
    corpus_emb = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries_emb = emb.filter(F.col("vec_id") < N_QUERIES)
    build_ann_index(spark, corpus_emb, idx2, bits=8)
    r = resize_ann_index(spark, idx2)
    m2 = read_ann_manifest(idx2)
    data2 = spark.read.parquet(os.path.join(idx2, m2["data"]))
    total_rows2 = data2.count()
    total_buckets2 = data2.select("tbl", "cb").distinct().count()
    rows_per_bucket = total_rows2 / max(total_buckets2, 1)
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    resized_rows = [
        tuple(x)
        for x in probe_ann_index(spark, queries_emb, idx2).collect()
    ]
    probe_resized_sec = round(time.perf_counter() - t0, 2)
    fly_resized = [
        tuple(x) for x in _ann_topk(emb, bits=r["bits"]).collect()
    ]
    assert sorted(resized_rows) == sorted(fly_resized), (
        f"resized stored-index answers diverge from on-the-fly at {n}x"
    )

    # POST-resize probe selectivity (r10 verdict item 2): the resized
    # probe's row mass shown in rows — the O(1)-per-probe claim that
    # fixture-scale WALLS (overhead-dominated) cannot show. Probed
    # (tbl, cb) pairs come from the same bounded list the probe
    # builds; rows_read is the mass of the probed-and-present buckets.
    probes2 = _ann_query_probes(
        _ann_sigs(queries_emb, m2["bits"]), m2["bits"], max_id=None
    )
    pairs2 = {
        (x["qtbl"], x["probe"])
        for x in probes2.select("qtbl", "probe").distinct().collect()
    }
    probe_pairs_df = spark.createDataFrame(
        [(int(t), int(b)) for t, b in sorted(pairs2)], "tbl int, cb long"
    )
    present = data2.select(
        F.col("tbl").cast("int").alias("tbl"),
        F.col("cb").cast("long").alias("cb"),
    ).join(F.broadcast(probe_pairs_df), ["tbl", "cb"], "inner")
    rows_read2 = present.count()
    buckets_probed2 = present.select("tbl", "cb").distinct().count()

    return {
        "resized_bits": r["bits"],
        "rows_per_bucket_after_resize": round(rows_per_bucket, 1),
        "index_probe_resized_sec": probe_resized_sec,
        "parity_resized": True,
        "resized_index_rows": total_rows2,
        "resized_total_buckets": total_buckets2,
        "resized_buckets_probed_present": buckets_probed2,
        "resized_bucket_touched_frac": round(
            buckets_probed2 / max(total_buckets2, 1), 4
        ),
        "resized_rows_read": rows_read2,
        "resized_rows_touched_frac": round(
            rows_read2 / max(total_rows2, 1), 4
        ),
        "resized_rows_read_per_probed_bucket": round(
            rows_read2 / max(buckets_probed2, 1), 1
        ),
        "corpus_rows": corpus_rows,
        "index_rows": index_rows,
        "total_buckets": total_buckets,
        "buckets_probed_present": buckets_probed,
        "bucket_touched_frac": round(buckets_probed / total_buckets, 4),
        "rows_read": rows_read,
        "rows_touched_frac": round(rows_read / index_rows, 4),
        "fly_sec": fly_sec,
        "index_write_sec": write_sec,
        "index_probe_sec": probe_sec,
        "parity": True,
    }


def _clustered_corpus(spark, n_random: int = 5000):
    """The LSH regime (each query has 5 planted near-copies, cosine
    ≈ 0.999) at a corpus size where signature-bit growth matters —
    the generator tests/test_similarity.py's clustered recall test
    uses, scaled up. Returns (df, planted_pairs, truth_top5)."""
    import random

    rng = random.Random(42)
    dim = 64
    vecs: dict[int, list[float]] = {}
    planted: set[tuple[int, int]] = set()
    for q in range(10):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        vecs[q] = base
        for j in range(5):
            nid = 10 + q * 5 + j
            vecs[nid] = [x + rng.uniform(-0.05, 0.05) for x in base]
            planted.add((q, nid))
    for i in range(100, 100 + n_random):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]

    # exact truth (numpy, driver-side — the corpus is tool-sized)
    import numpy as np

    ids = sorted(vecs)
    X = np.asarray([vecs[i] for i in ids], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth: set[tuple[int, int]] = set()
    corpus_ids = [i for i in ids if i >= N_QUERIES]
    C = Xn[[ids.index(i) for i in corpus_ids]]
    for q in range(10):
        sims = C @ Xn[ids.index(q)]
        top = sorted(
            zip(sims, corpus_ids), key=lambda t: (-t[0], t[1])
        )[:5]
        truth |= {(q, nid) for _, nid in top}

    df = spark.createDataFrame(sorted(vecs.items()), ["vec_id", "v"])
    return df.localCheckpoint(eager=True), planted, truth


def bits_curve(spark, bits_list=(8, 12, 16)) -> dict:
    """The r8 verdict's selectivity curve: with bucket count frozen at
    2^8 per table, bucket_touched_frac was pinned at ~0.6 regardless
    of corpus size. Growing the signature bits drops the touched
    fraction (probes are constant, buckets multiply) — this measures
    touched/rows fractions AND recall per bits setting on clustered
    data, holding ANN_TABLES/ANN_PROBE_BITS fixed."""
    import irio2024_mapreduce_spark.operators.similarity as sim

    df, planted, truth = _clustered_corpus(spark)
    orig_planes = sim.ANN_PLANES
    out: dict[str, dict] = {}
    try:
        for bits in bits_list:
            sim.ANN_PLANES = bits
            sigs = _ann_sigs(df)
            corpus = _ann_corpus_rows(sigs).localCheckpoint(eager=True)
            probes = _ann_query_probes(sigs).localCheckpoint(eager=True)
            present = corpus.select("tbl", "cb").distinct()
            probed = probes.select(
                F.col("qtbl").alias("tbl"), F.col("probe").alias("cb")
            ).distinct()
            total_buckets = present.count()
            touched = probed.join(present, ["tbl", "cb"], "semi").count()
            index_rows = corpus.count()
            rows_read = corpus.join(probed, ["tbl", "cb"], "semi").count()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in _ann_join_score(corpus, probes).collect()
            }
            out[str(bits)] = {
                "total_buckets_present": total_buckets,
                "buckets_probed_present": touched,
                "bucket_touched_frac": round(touched / total_buckets, 4),
                "index_rows": index_rows,
                "rows_read": rows_read,
                "rows_touched_frac": round(rows_read / index_rows, 4),
                "recall_planted": round(
                    len(got & planted) / len(planted), 3
                ),
                "recall_exact_top5": round(
                    len(got & truth) / len(truth), 3
                ),
            }
            drain_driver_backlog(spark)
    finally:
        sim.ANN_PLANES = orig_planes
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-ann-index")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf": sf_dir, "scales": {}}
    for scale in (1, n):
        out["scales"][f"{scale}x"] = run_scale(spark, sf_dir, scale)
    s1, sn = out["scales"]["1x"], out["scales"][f"{n}x"]
    out["probe_ratio"] = round(
        sn["index_probe_sec"] / max(s1["index_probe_sec"], 0.01), 1
    )
    out["probe_ratio_after_resize"] = round(
        sn["index_probe_resized_sec"]
        / max(s1["index_probe_resized_sec"], 0.01),
        1,
    )
    # the structural claim (r10 verdict item 2): post-resize rows_read
    # per probed bucket ≈ bucket_target at BOTH scales — the probe's
    # row mass is corpus-size independent after maintenance
    out["resized_rows_read_ratio"] = round(
        sn["resized_rows_read"] / max(s1["resized_rows_read"], 1), 2
    )
    out["resized_touched_frac_shrink"] = round(
        s1["resized_rows_touched_frac"]
        / max(sn["resized_rows_touched_frac"], 1e-9),
        1,
    )
    out["bits_curve"] = bits_curve(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
