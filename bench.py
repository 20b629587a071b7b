"""Benchmark harness — runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "value_r01_comparable_subset": sec, "queries": {name: sec, ...},
     "sf": ..., "load_avg_start": [...], "load_avg_end": [...]}

Timing excludes JVM startup (a warm-up action runs first) and driver-
side result transfer (queries execute to completion via the noop
sink, so what's measured is scan + shuffle + compute — the part that
scales to 100 TB).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from irio2024_mapreduce_spark import registry
from irio2024_mapreduce_spark.session import get_spark

# Representative of every operator family: scan+flatMap+agg, hash agg,
# broadcast & shuffle joins, window w/ frame, time windows, dedup,
# similarity, text analysis, clustering. Keep in sync as new families
# land. NB: the list GREW by five in round 3 (simhash, ngram-jaccard,
# ann, ivf, clusters — so the round-2 candidate-cap/posting-list/
# multi-probe work is regression-guarded) — r03+ totals are not
# comparable to r01/r02 totals; compare per-query times.
HEADLINE = [
    "wordcount",
    "filter_project",
    "agg_groupby",
    "agg_rollup",
    "join_broadcast",
    "join_shuffle",
    "join_outer",
    "window_running",
    "sort_limit_topk",
    "event_sliding",
    "event_session",
    "json_extract",
    "dedup_exact",
    "dedup_near",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "similarity_topk",
    "similarity_ann",
    "similarity_ivf",
    "text_analysis",
    "join_asof",
    "stats_pack",
    "time_rollup",
    "conditional_agg",
]

# The 20 queries HEADLINE contained through rounds 1-2 — their
# subtotal is emitted separately so r03+ artifacts stay directly
# comparable to BENCH_r01/r02 totals despite the five added queries.
R01_COMPARABLE = [
    "wordcount",
    "filter_project",
    "agg_groupby",
    "agg_rollup",
    "join_broadcast",
    "join_shuffle",
    "join_outer",
    "window_running",
    "sort_limit_topk",
    "event_sliding",
    "event_session",
    "json_extract",
    "dedup_exact",
    "dedup_near",
    "similarity_topk",
    "text_analysis",
    "join_asof",
    "stats_pack",
    "time_rollup",
    "conditional_agg",
]

# report min of N — steady-state, post-JIT, robust to background load
ITERATIONS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))


def run_once(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    # sample BEFORE the Spark session exists: this is the background
    # load a reader needs to judge the artifact — sampled at the end
    # it would mostly measure the bench's own CPU burn
    load_start = [round(x, 2) for x in os.getloadavg()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warm-up: pay JVM/codegen init outside the timings
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    missing = [name for name in HEADLINE if name not in qs]
    if missing:
        raise SystemExit(
            f"bench: headline queries missing from registry: {missing} — "
            "a silent skip would shrink the reported total and read as a "
            "speedup"
        )
    drifted = [name for name in R01_COMPARABLE if name not in HEADLINE]
    if drifted:
        raise SystemExit(
            f"bench: r01-comparable queries missing from HEADLINE: "
            f"{drifted} — a shrunken subtotal would read as a cross-round "
            "speedup"
        )
    results: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(ITERATIONS):
            t0 = time.perf_counter()
            run_once(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)

    total = round(sum(results.values()), 3)
    # no membership guard: a missing name must raise (KeyError), not
    # silently shrink the subtotal into a phantom speedup
    r01_subset = round(sum(results[n] for n in R01_COMPARABLE), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                # the rounds-1/2 HEADLINE subtotal — compare THIS to
                # BENCH_r01/r02 "value"; the full total covers 5 more
                # queries than those artifacts did
                "value_r01_comparable_subset": r01_subset,
                "queries": results,
                "sf": sf_dir,
                # background load swings single runs 2×+ (see SCALE.md
                # bench methodology) — the pre-session sample is the
                # honest contention evidence; the end sample mostly
                # reflects the bench's own burn and is included only
                # to show load ramp during the run
                "load_avg_start": load_start,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
