"""Before/after probe for the dedup_clusters seeding mechanism at
stress scale (VERDICT r4 item 5): measures, on an N×-replicated sf0.1
corpus, ``dedup_clusters`` with exact-dup representative SEEDING on vs
off (``chunking.CC_REP_SEEDING``). Seeding starts exact cliques
converged, so the win grows with replication factor — every replica
group is an N-clique, exactly the shape replicated crawl data has.
Reports wall seconds and propagation rounds for both settings.

(The companion similarity_ivf before/after is cross-round: the round-5
sample-trained form's stress numbers from tools/stress_scale.py are
compared against the round-3/4 tables recorded in SCALE.md — the old
corpus-pass training loop no longer exists to re-run.)

Usage: python tools/stress_cc_ivf.py [N]   (default 30)
Prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark.operators import chunking
from irio2024_mapreduce_spark.session import get_spark
from tools.stress_scale import build_scaled_corpus


def timed(fn, *args) -> float:
    gc.collect()  # drain py4j ref backlog outside the timed window
    t0 = time.perf_counter()
    fn(*args).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-cc-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    stage = build_scaled_corpus(spark, base, n)

    # warm-up pass so JVM/codegen init lands on neither measurement
    timed(chunking.dedup_clusters, spark, stage)

    cc: dict[str, dict | float] = {}
    for label, flag in (("unseeded", False), ("seeded", True)):
        chunking.CC_REP_SEEDING = flag
        sec = timed(chunking.dedup_clusters, spark, stage)
        cc[label] = {"sec": sec, "rounds": chunking._LAST_CC_ROUNDS}
    chunking.CC_REP_SEEDING = True
    cc["speedup"] = round(cc["unseeded"]["sec"] / cc["seeded"]["sec"], 2)
    print(json.dumps({"scale": n, "dedup_clusters": cc}))


if __name__ == "__main__":
    main()
