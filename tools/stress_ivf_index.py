"""Stored-IVF-index probe (r9 verdict item 3): build the
cell-partitioned index, answer the query set by point-reading only the
probed cells, and assert parity with the on-the-fly composition at 1×
and N× corpus. Mirrors tools/stress_ann_index.py's structure.

What this proves:
  * the stored layout works: partition dirs are the cells, a probe is
    a path list of nprobe dirs per query, unprobed cells never open;
  * stored and on-the-fly answers are IDENTICAL at both scales;
  * k grows with the corpus (k ≈ √rows), so the touched fraction
    nprobe/k SHRINKS as the corpus grows — measured as cells probed /
    cells present and rows read / index rows;
  * the quantized (int8) store: byte ratio and recall vs the fp index.

Usage: python tools/stress_ivf_index.py [N]     (default 100)
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.ivf_index import (
    build_ivf_index,
    probe_ivf_index,
    target_cells,
)
from irio2024_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    _as_double,
    _ivf_centroids,
    _ivf_score,
    _nearest_cell,
    _query_cells,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table_parallel


def scaled_emb(spark, sf_dir: str, n: int):
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


def _bytes_of(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
        if os.path.isfile(f)
    )


def run_scale(spark, sf_dir: str, n: int) -> dict:
    emb = scaled_emb(spark, sf_dir, n).localCheckpoint(eager=True)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).localCheckpoint(
        eager=True
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint(
        eager=True
    )
    corpus_rows = corpus.count()
    k = target_cells(corpus_rows)

    # on-the-fly reference at the index's own k (shared code path)
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    centroids = _ivf_centroids(spark, corpus, k)
    fly = [
        tuple(r)
        for r in _ivf_score(
            _nearest_cell(corpus, centroids), _query_cells(queries, centroids)
        ).collect()
    ]
    fly_sec = round(time.perf_counter() - t0, 2)

    idx = tempfile.mkdtemp(prefix=f"ivf_idx_{n}x_")
    t0 = time.perf_counter()
    m = build_ivf_index(spark, corpus, idx)
    write_sec = round(time.perf_counter() - t0, 2)
    data_dir = os.path.join(idx, f"cells_v{m['data_version']}")
    cells_present = sum(
        1 for d in os.listdir(data_dir) if d.startswith("cell=")
    )

    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    res = probe_ivf_index(spark, queries, idx)
    stored_rows = [tuple(r) for r in res.collect()]
    probe_sec = round(time.perf_counter() - t0, 2)

    assert sorted(stored_rows) == sorted(fly), (
        f"stored-IVF answers diverge from on-the-fly at {n}x"
    )

    # touched fraction: distinct probed cells / cells present, and the
    # row mass inside them / index rows
    cents = spark.read.parquet(
        os.path.join(idx, f"centroids_v{m['data_version']}")
    )
    probed = {
        r["cell"]
        for r in _query_cells(queries, cents).select("cell")
        .distinct()
        .collect()
    }
    data = spark.read.parquet(data_dir)
    rows_read = data.filter(
        F.col("cell").cast("int").isin(sorted(probed))
    ).count()
    index_rows = data.count()

    # quantized twin: bytes + recall vs the fp stored answers
    idxq = tempfile.mkdtemp(prefix=f"ivf_idxq_{n}x_")
    build_ivf_index(spark, corpus, idxq, quantize=True)
    got_q = {
        (r["query_id"], r["neighbor_id"])
        for r in probe_ivf_index(spark, queries, idxq).collect()
    }
    got_fp = {(a, b) for a, b, _, _ in stored_rows}

    return {
        "corpus_rows": corpus_rows,
        "k_cells": m["k_cells"],
        "cells_present": cells_present,
        "cells_probed": len(probed),
        "cell_touched_frac": round(len(probed) / cells_present, 4),
        "index_rows": index_rows,
        "rows_read": rows_read,
        "rows_touched_frac": round(rows_read / index_rows, 4),
        "fly_sec": fly_sec,
        "index_write_sec": write_sec,
        "index_probe_sec": probe_sec,
        "parity": True,
        "quantized_bytes_ratio": round(
            _bytes_of(os.path.join(idxq, "cells_v1"))
            / max(_bytes_of(data_dir), 1),
            3,
        ),
        "quantized_recall_vs_fp": round(
            len(got_q & got_fp) / max(len(got_fp), 1), 3
        ),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-ivf-index")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf": sf_dir, "scales": {}}
    for scale in (1, n):
        out["scales"][f"{scale}x"] = run_scale(spark, sf_dir, scale)
    s1, sn = out["scales"]["1x"], out["scales"][f"{n}x"]
    out["probe_ratio"] = round(
        sn["index_probe_sec"] / max(s1["index_probe_sec"], 0.01), 1
    )
    out["touched_frac_shrink"] = round(
        s1["rows_touched_frac"] / max(sn["rows_touched_frac"], 1e-9), 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
