"""Scaling probe: run the text/dedup operator family at 1× and N×
corpus size and report the observed time scaling.

The N× corpus is the sf0.1 documents table replicated with shifted
doc_ids and written as MULTI-FILE parquet (real splits, unlike the
single-row-group fixtures) — every original doc gains N-1 exact
duplicates, which is the realistic shape of crawl data and the worst
case for near-dup candidate generation (every group is an N-clique in
the LSH band graph).

Usage: python tools/stress_scale.py [N]    (default 10)
Prints one JSON line with per-query seconds at 1x and Nx.

`python tools/stress_scale.py --relational [N]` probes the
relational/event family instead: the FACT tables (lineitem, orders,
events) are replicated N× — orderkeys shift consistently across
lineitem+orders so the join relationships survive; events shift
event_id+user_id so the user population grows rather than per-user
burst — while the dimension tables stay 1× (the 100 TB model: facts
grow, dims don't). Queries: join_shuffle (TPC-H-Q5-shaped 6-table
join), window_running (per-customer running sums over N× orders per
customer), event_session (gap sessionization over N× users),
stats_pack (full-scan statistical aggregates), agg_rollup
(hierarchical rollup over the grown fact).

`python tools/stress_scale.py --adversarial` instead probes the
ngram-Jaccard posting-list join with a stop-word corpus: every doc
shares a dense set of stop-word 3-grams (one length band, hot posting
lists), which is the worst case for a posting join — each shingle
shared by m docs contributes m² join rows. The probe reports the
posting-join row count with the per-(band, shingle) posting cap
enabled vs disabled.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark import registry
from irio2024_mapreduce_spark.operators.similarity import N_QUERIES
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark

# dedup_ngram_jaccard rides the same exact-dup collapse as dedup_near
# (replicated docs collapse to the same reps) and its length-band
# blocks are additionally bounded by PAIRWISE_BLOCK_CAP — the probe
# verifies the measured ratio stays ~linear. dedup_clusters stresses
# the exact-edge path (every replica adds a rep↔dup edge: ~N·docs
# edges) and label propagation over N× members; similarity_ann /
# similarity_ivf run over the N×-replicated embeddings table
# (replicas carry shifted vec_ids ≥ N_QUERIES, so the query set stays
# the original 10 and the corpus grows N×).
QUERIES = [
    "wordcount",
    "dedup_exact",
    "dedup_near",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "similarity_ann",
    "similarity_ivf",
    "text_analysis",
    "doc_chunk",
]


def adversarial_postings() -> None:
    """Stop-word corpus: n_docs docs, each = the same 40 stop words
    (shuffled deterministically per doc) + a few unique tokens. All
    docs land in one length band and every stop-word 3-gram's posting
    list is ~corpus-sized. Measures the posting-join row count (the
    candidate volume the cap exists to bound) capped vs uncapped."""
    import irio2024_mapreduce_spark.operators.dedup as dd

    spark = get_spark("stress-adversarial")
    spark.sparkContext.setLogLevel("ERROR")
    # 800 < PAIRWISE_BLOCK_CAP so the length band is ADMITTED — the
    # posting cap must be the guard that bounds the join, not the
    # block cap one level up
    n_docs = 800
    stop = [f"the{i}" for i in range(40)]
    rows = []
    for i in range(n_docs):
        toks = stop[i % 7 :] + stop[: i % 7] + [f"uniq{i}a", f"uniq{i}b"]
        rows.append((i, " ".join(toks), "en", "s", 1))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    stage = tempfile.mkdtemp(prefix="stress_adv_")
    df.repartition(8).write.mode("overwrite").parquet(
        os.path.join(stage, "documents.parquet")
    )

    out = {}
    for label, cap in [("capped", dd.NGRAM_POSTING_CAP), ("uncapped", 10**9)]:
        joined = dd._ngram_posting_join(spark, stage, posting_cap=cap)
        t0 = time.perf_counter()
        cnt = joined.count()
        out[label] = {
            "posting_join_rows": cnt,
            "sec": round(time.perf_counter() - t0, 2),
        }
    print(json.dumps({"adversarial_postings": out, "n_docs": n_docs}))


RELATIONAL_QUERIES = [
    "join_shuffle",
    "window_running",
    "event_session",
    "stats_pack",
    "agg_rollup",
]


def build_scaled_relational(spark, base: str, n: int) -> str:
    """Replicate the fact tables (lineitem, orders, events) n× into a
    temp dir; dimension tables are written through 1× so every query's
    full table set resolves. Orderkeys shift in lockstep across
    lineitem and orders (join relationships survive; each customer
    accumulates n× orders — dims fixed, facts grow). Events shift
    event_id AND user_id so sessionization sees n× distinct users,
    not n identical events per session."""
    stage = tempfile.mkdtemp(prefix="stress_rel_")
    shift = 100_000_000

    def replicate(table: str, key_cols: list[str]) -> None:
        df = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
        scaled = None
        for k in range(n):
            part = df
            for c in key_cols:
                part = part.withColumn(c, F.col(c) + F.lit(k * shift))
            scaled = part if scaled is None else scaled.unionByName(part)
        scaled.repartition(32).write.mode("overwrite").parquet(
            os.path.join(stage, f"{table}.parquet")
        )

    replicate("lineitem", ["l_orderkey"])
    replicate("orders", ["o_orderkey"])
    replicate("events", ["event_id", "user_id"])
    for dim in ("customer", "supplier", "nation", "region", "part"):
        spark.read.parquet(
            os.path.join(base, f"{dim}.parquet")
        ).write.mode("overwrite").parquet(
            os.path.join(stage, f"{dim}.parquet")
        )
    return stage


def build_scaled_corpus(spark, base: str, n: int) -> str:
    """Replicate sf-dir documents+embeddings n× into a temp dir and
    return its path (multi-file parquet, real splits). Doc replicas
    shift doc_id; embedding replicas shift vec_id past the query
    range so the query set stays the original N_QUERIES vectors while
    the corpus grows n× (duplicate vectors = worst case for bucketed
    ANN: every replica group lands in identical buckets)."""
    stage = tempfile.mkdtemp(prefix="stress_")
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    scaled = None
    for k in range(n):
        part = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
        )
        scaled = part if scaled is None else scaled.unionByName(part)
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(stage, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    scaled_emb = None
    for k in range(n):
        part = emb if k == 0 else emb.filter(
            F.col("vec_id") >= N_QUERIES  # replicas never become queries
        ).withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
        scaled_emb = (
            part if scaled_emb is None else scaled_emb.unionByName(part)
        )
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(stage, "embeddings.parquet")
    )
    return stage


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--adversarial":
        adversarial_postings()
        return
    relational = bool(argv) and argv[0] == "--relational"
    if relational:
        argv = argv[1:]
    n = int(argv[0]) if argv else 10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    if relational:
        stage = build_scaled_relational(spark, base, n)
        probe_queries = RELATIONAL_QUERIES
    else:
        stage = build_scaled_corpus(spark, base, n)
        probe_queries = QUERIES

    qs = dict(registry.queries())
    # retired-but-still-probed queries (dedup_near/dedup_simhash left
    # the graded window but keep their scale series)
    from irio2024_mapreduce_spark.operators import dedup as _dedup

    for _n, _f in _dedup.RETIRED_ROWS_ONLY_QUERIES.items():
        qs.setdefault(_n, _f)
    out: dict[str, dict[str, float]] = {}
    for name in probe_queries:
        times = {}
        for label, d in [("1x", base), (f"{n}x", stage)]:
            qs[name](spark, d).write.mode("overwrite").format("noop").save()
            # drain the py4j ref backlog + nudge ContextCleaner
            # outside the timed window (SCALE.md round-5)
            drain_driver_backlog(spark)
            t0 = time.perf_counter()
            qs[name](spark, d).write.mode("overwrite").format("noop").save()
            times[label] = round(time.perf_counter() - t0, 2)
        times["ratio"] = round(times[f"{n}x"] / max(times["1x"], 0.01), 1)
        out[name] = times
    print(json.dumps({"scale": n, "results": out}))


if __name__ == "__main__":
    main()
