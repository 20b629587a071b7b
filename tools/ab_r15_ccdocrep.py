"""Interleaved A/B (r15): dedup_clusters' doc→rep attachment.

Current shape: ``hashed = docs.select(doc_id, sha2).localCheckpoint``
feeding BOTH a groupBy(_h).min(doc_id) (reps) and a hashed⋈reps join
(doc_rep) — the checkpoint exists because two consumers would re-run
the scan+sha2 pass. Candidate: doc_rep in ONE pass via
``min(doc_id) over (partition by _h)`` — one exchange on the 32-byte
hash rows, no checkpoint, no join. Trade at scale: the window sorts
hash rows within partitions and holds one duplicate GROUP per task
buffer (groups are cliques — bounded by the corpus dup profile),
where the join path's groupBy collapses map-side first. Parity-gated
on the full dedup_clusters result at sf0.01.

Usage: python tools/ab_r15_ccdocrep.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators import chunking as C
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark


def result_hash(df) -> str:
    rows = sorted(str(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--parity-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(
        "ab-r15-ccdocrep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    orig = C._doc_rep

    def window_doc_rep(docs_raw):
        hashed = docs_raw.select(
            "doc_id", F.sha2("text", 256).alias("_h")
        )
        return hashed.select(
            "doc_id",
            F.min("doc_id").over(Window.partitionBy("_h")).alias("rep"),
        )

    def run(fn, sf):
        C._doc_rep = fn
        try:
            t0 = time.perf_counter()
            df = C.dedup_clusters(spark, sf)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0, df
        finally:
            C._doc_rep = orig

    print("== parity ==", flush=True)
    C._doc_rep = orig
    h_old = result_hash(C.dedup_clusters(spark, args.parity_sf))
    C._doc_rep = window_doc_rep
    try:
        h_new = result_hash(C.dedup_clusters(spark, args.parity_sf))
    finally:
        C._doc_rep = orig
    print(f"old={h_old} new={h_new}", flush=True)
    assert h_old == h_new

    olds, news = [], []
    for r in range(args.rounds):
        drain_driver_backlog(spark)
        olds.append(run(orig, args.sf)[0])
        drain_driver_backlog(spark)
        news.append(run(window_doc_rep, args.sf)[0])
        print(
            f"round {r}: old={olds[-1]:.2f} new={news[-1]:.2f}", flush=True
        )
    print(
        f"min {min(olds):.2f} -> {min(news):.2f}; "
        f"median {sorted(olds)[len(olds)//2]:.2f} -> "
        f"{sorted(news)[len(news)//2]:.2f}"
    )


if __name__ == "__main__":
    main()
