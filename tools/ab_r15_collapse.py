"""Interleaved in-session A/B of the exact-dup COLLAPSE shape
(r15, VERDICT r14 items 1+2).

Every dedup family routes its exact-duplicate collapse through
``dedup._collapse_reps``; this tool monkey-patches that one function
with each candidate shape and times the SAME query bodies, alternating
shapes within one Spark session (host drift hits all arms equally).
A result-hash parity gate at sf0.01 precedes any timing.

Shapes:

* E  (r14 shipped): ``repartition(N, hash)`` -> groupBy -> agg.
  One exchange; the full raw text shuffles; NO map-side partial agg;
  the agg plans as a complete-mode SortAggregate (text in the buffer).
* C  (r13 shipped): groupBy -> agg -> round-robin ``repartition(N)``.
  Partial agg collapses map-side; round-robin pays
  sortBeforeRepartition on the reps.
* C2: groupBy -> agg -> ``repartition(N, doc_id)``. Partial agg, no
  round-robin sort (hash exchange on a high-cardinality long).
* J  (ids-then-attach, guide §3.2/§8): winners =
  groupBy(hash).agg(min(doc_id)) — a HashAggregate over (32-hex, long)
  with map-side partials, the text never enters an agg buffer — then a
  semi-join attaches each winner's own row, then
  ``repartition(N, doc_id)`` spreads for the downstream expression
  work. Text crosses ONE exchange (the spread), same as E, but is
  never sorted or buffered by the aggregate.

Usage: python tools/ab_r15_collapse.py [--families a,b] [--rounds 3]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F

from irio2024_mapreduce_spark.operators import dedup as D
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table


# NB: the shipped _collapse_reps takes (raw, hash_col, shape, nbytes);
# the variant shapes here accept and ignore the extra args so the
# monkey-patch forces ONE shape across every call site during its arm.
def collapse_E(raw: DataFrame, hash_col: Column, *_a, **_k) -> DataFrame:
    spark = raw.sparkSession
    return (
        raw.repartition(spark.sparkContext.defaultParallelism, hash_col)
        .groupBy(hash_col.alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
    )


def collapse_C(raw: DataFrame, hash_col: Column, *_a, **_k) -> DataFrame:
    spark = raw.sparkSession
    return (
        raw.groupBy(hash_col.alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def collapse_C2(raw: DataFrame, hash_col: Column, *_a, **_k) -> DataFrame:
    spark = raw.sparkSession
    return (
        raw.groupBy(hash_col.alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


def collapse_J(raw: DataFrame, hash_col: Column, *_a, **_k) -> DataFrame:
    spark = raw.sparkSession
    win = (
        raw.select(hash_col.alias("_h"), "doc_id")
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return (
        raw.join(win.select("doc_id"), "doc_id", "semi")
        .select(hash_col.alias("_h"), "doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


SHAPES = {
    "E": collapse_E,
    "C": collapse_C,
    "C2": collapse_C2,
    "J": collapse_J,
}


def result_hash(df: DataFrame) -> str:
    rows = sorted(str(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--parity-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--families", default=None)
    ap.add_argument("--shapes", default="E,C,C2,J")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    from irio2024_mapreduce_spark import registry

    qs = dict(registry.queries())
    for _n, _f in D.RETIRED_ROWS_ONLY_QUERIES.items():
        qs.setdefault(_n, _f)

    fam_names = [
        "dedup_near",
        "dedup_near_md5",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_incremental",
    ]
    if args.families:
        fam_names = [f for f in fam_names if f in set(args.families.split(","))]
    shape_names = args.shapes.split(",")

    spark = get_spark(
        "ab-r15-collapse",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # fixture duplicate factor — the quantity the r14 trade condition
    # ("one exchange wins when dup factor < 2") was never measured on
    for sf in (args.parity_sf, args.sf):
        docs = load_table(spark, sf, "documents")
        n, nd = (
            docs.agg(
                F.count("*"), F.count_distinct(F.sha2("text", 256))
            ).collect()
        )[0]
        print(f"dup factor at {sf}: {n} docs / {nd} distinct = {n/nd:.3f}",
              flush=True)

    orig = D._collapse_reps

    def run_with(shape_fn, fam, sf) -> DataFrame:
        D._collapse_reps = shape_fn
        try:
            return qs[fam](spark, sf)
        finally:
            D._collapse_reps = orig

    if not args.skip_parity:
        print(f"== parity at {args.parity_sf} ==", flush=True)
        for fam in fam_names:
            hs = {}
            for s in shape_names:
                hs[s] = result_hash(run_with(SHAPES[s], fam, args.parity_sf))
            ok = len(set(hs.values())) == 1
            print(("OK " if ok else "MISMATCH") + f" {fam:22s} {hs}",
                  flush=True)
            assert ok, fam

    print(f"== interleaved timing at {args.sf} ({args.rounds} rounds) ==",
          flush=True)
    out: dict[str, dict[str, list[float]]] = {}
    for fam in fam_names:
        walls: dict[str, list[float]] = {s: [] for s in shape_names}
        for r in range(args.rounds):
            # rotate order so warm-cache position bias averages out
            order = shape_names[r % len(shape_names):] + \
                shape_names[:r % len(shape_names)]
            for s in order:
                drain_driver_backlog(spark)
                # time construction + execution together, exactly like
                # bench.py: the lazy localCheckpoints inside the dedup
                # builders EXECUTE their subtree at construction (AQE's
                # toRdd materializes non-result stages), so the collapse
                # shape's cost lives in the BUILD wall, not the noop wall
                t0 = time.perf_counter()
                df = run_with(SHAPES[s], fam, args.sf)
                df.write.mode("overwrite").format("noop").save()
                walls[s].append(time.perf_counter() - t0)
        out[fam] = walls
        print(
            f"{fam:22s} "
            + "  ".join(
                f"{s}={min(w):.2f}/{sorted(w)[len(w)//2]:.2f}"
                for s, w in walls.items()
            )
            + "   (min/median)",
            flush=True,
        )

    print("== summary (min) ==")
    for fam, walls in out.items():
        best = min(walls, key=lambda s: min(walls[s]))
        print(
            f"{fam:22s} "
            + "  ".join(f"{s}={min(w):.2f}" for s, w in walls.items())
            + f"   best={best}"
        )


if __name__ == "__main__":
    main()
