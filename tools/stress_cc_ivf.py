"""Before/after probe for the dedup_clusters graph form at stress
scale: measures, on an N×-replicated sf0.1 corpus, ``dedup_clusters``
with the COLLAPSED representative graph (round-5 form, the label loop
never sees duplicate members) vs the legacy member graph
(``chunking.CC_REP_SEEDING`` False). The win grows with replication
factor — every replica group is an N-clique that the collapsed form
reduces to one node. Reports wall seconds and propagation rounds for
both settings; the two forms' results are asserted identical by
tests/test_dedup.py::test_cc_rep_seeding_parity_with_member_graph.

(The companion similarity_ivf before/after is cross-round: the round-5
sample-trained form's stress numbers from tools/stress_scale.py are
compared against the round-3/4 tables recorded in SCALE.md — the old
corpus-pass training loop no longer exists to re-run.)

Usage: python tools/stress_cc_ivf.py [N]   (default 30)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark.operators import chunking
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from tools.stress_scale import build_scaled_corpus


def timed(spark, fn, *args) -> float:
    # drain py4j refs + nudge ContextCleaner outside the timed window
    drain_driver_backlog(spark)
    t0 = time.perf_counter()
    fn(*args).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-cc-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    stage = build_scaled_corpus(spark, base, n)

    # one warm-up per form, then ALTERNATING min-of-2 timed runs:
    # single-shot measurements at this scale are dominated by driver/
    # page-cache state (measured 8-47 s for the same form in one
    # session), and alternating forms shares that state fairly
    forms = (("member_graph", False), ("collapsed_graph", True))
    for _, flag in forms:
        chunking.CC_REP_SEEDING = flag
        chunking.dedup_clusters(spark, stage).write.mode(
            "overwrite"
        ).format("noop").save()
    cc: dict[str, dict | float] = {
        label: {"secs": []} for label, _ in forms
    }
    for _rep in range(2):
        for label, flag in forms:
            chunking.CC_REP_SEEDING = flag
            cc[label]["secs"].append(
                timed(spark, chunking.dedup_clusters, spark, stage)
            )
            cc[label]["rounds"] = chunking._LAST_CC_ROUNDS
    for label, _ in forms:
        cc[label]["sec"] = min(cc[label]["secs"])
    chunking.CC_REP_SEEDING = True
    cc["speedup"] = round(
        cc["member_graph"]["sec"] / cc["collapsed_graph"]["sec"], 2
    )
    print(json.dumps({"scale": n, "dedup_clusters": cc}))


if __name__ == "__main__":
    main()
