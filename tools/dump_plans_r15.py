"""Dump .explain("formatted") for the r15-touched queries into
plans/r15/<query>_{before,after}.txt.

"before" reconstructs the r14-final shape by monkey-patching
``dedup._collapse_reps`` to the exchange_first form at EVERY call site
(what r14 shipped everywhere); "after" is the working tree (per-site
shapes). Queries whose plan the round did not change are dumped
"after" only when explicitly listed.

Usage: python tools/dump_plans_r15.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark import registry
from irio2024_mapreduce_spark.operators import dedup as D
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from ab_r15_collapse import collapse_E  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def _old_verify_candidate_pairs(pairs, raw):
    """The r14 verify shape (no pair-key spread) — the 'before' arm
    for the dedup_near/near_md5 dumps."""
    melted = pairs.select(
        F.struct("doc_a", "doc_b").alias("pair"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("role"), F.col("doc_a").alias("doc_id")
                ),
                F.struct(
                    F.lit("b").alias("role"), F.col("doc_b").alias("doc_id")
                ),
            )
        ).alias("m"),
    ).select("pair", "m.role", "m.doc_id")
    with_sh = (
        melted.join(raw, "doc_id")
        .withColumn("_toks", D._tokens())
        .select(
            "pair", "role", D._shingles_from(F.col("_toks")).alias("sh")
        )
    )
    return (
        with_sh.groupBy("pair")
        .agg(
            F.first(
                F.when(F.col("role") == "a", F.col("sh")), ignorenulls=True
            ).alias("sh_a"),
            F.first(
                F.when(F.col("role") == "b", F.col("sh")), ignorenulls=True
            ).alias("sh_b"),
        )
        .select(
            F.col("pair.doc_a").alias("doc_a"),
            F.col("pair.doc_b").alias("doc_b"),
            F.round(
                D._jaccard(F.col("sh_a"), F.col("sh_b")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r15",
)

DEFAULT = ["dedup_ngram_jaccard", "dedup_incremental", "dedup_clusters"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        "plans-r15", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(registry.queries())
    for _n, _f in D.RETIRED_ROWS_ONLY_QUERIES.items():
        qs.setdefault(_n, _f)

    # For the non-iterative queries, neutralize localCheckpoint during
    # the dump: the lazy checkpoints truncate the dumped plan at an
    # ExistingRDD (the r14 caveat — the collapse subtree was invisible
    # in the dump), and they also EXECUTE their subtree at build time,
    # which an explain-only tool shouldn't pay. The dumped plan is the
    # full logical pipeline the checkpointed execution computes in
    # pieces. dedup_clusters keeps real checkpoints (its construction
    # runs convergence-count actions; un-checkpointed lineage would
    # change what executes) — its dump stays post-checkpoint-truncated.
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides localCheckpoint — patch the concrete class
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: PLC0415

    real_ckpt = DataFrame.localCheckpoint
    orig = D._collapse_reps
    orig_verify = D._verify_candidate_pairs
    for name in names:
        no_ckpt = name != "dedup_clusters"
        for tag, fn in (("before", collapse_E), ("after", orig)):
            drain_driver_backlog(spark)
            D._collapse_reps = fn
            # the 'before' arm also reconstructs the r14 verify shape
            # (no pair-key spread) for the queries that use it
            if tag == "before":
                D._verify_candidate_pairs = _old_verify_candidate_pairs
            if no_ckpt:
                DataFrame.localCheckpoint = lambda self, eager=True: self
            try:
                df = qs[name](spark, sf)
            finally:
                D._collapse_reps = orig
                D._verify_candidate_pairs = orig_verify
                DataFrame.localCheckpoint = real_ckpt
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(OUT, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
