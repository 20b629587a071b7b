"""Ingest-integrated stored-index overhead (r11): the transactional
ingest's new similarity-index parts must not change the ingest's cost
class. Measures, at a few-thousand-doc batch size:

  * ingest_batch WITHOUT index dirs (the r10 baseline path);
  * ingest_batch WITH ann_index_dir + ivf_index_dir (stage the shaped
    rows beside the other parts; publication stays pure renames);
  * the post-ingest stored probes, parity-checked against physical
    membership.

What this proves: the added cost is one map-only signature projection
+ one map-only cell assignment + partitioned staged writes — batch-
sized work, not corpus-sized — and the probe after ingest answers over
the full corpus. Prints one JSON line.

Usage: python tools/stress_ingest_sim.py [N_DOCS]    (default 4000)
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.ann_index import (
    build_ann_index,
    probe_ann_index,
    read_ann_manifest,
)
from irio2024_mapreduce_spark.operators.ivf_index import (
    build_ivf_index,
    probe_ivf_index,
    read_ivf_manifest,
)
from irio2024_mapreduce_spark.operators.similarity import EMB_DIM
from irio2024_mapreduce_spark.plans.ingest import (
    build_corpus_index,
    ingest_batch,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark

WORDS = (
    "river stone bridge meadow lantern harbor forest signal copper "
    "window letter march quiet garden motor saddle timber anchor "
    "valley summit ferry orchard mill tower"
).split()


def _docs(spark, ids):
    def text(i):
        rng = random.Random(i)
        body = " ".join(
            f"{rng.choice(WORDS)}{rng.randint(0, 9999)}"
            for _ in range(40)
        )
        return "the quick note and " + body

    rows = [(int(i), text(i)) for i in ids]
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def _emb(spark, ids):
    # deterministic vectors without a Python loop per element cost
    # concern — tool-sized, driver-side generation is fine
    def vec(i):
        rng = random.Random(i)
        return [rng.uniform(-1.0, 1.0) for _ in range(EMB_DIM)]

    return spark.createDataFrame(
        [(int(i), vec(i)) for i in ids], "vec_id long, v array<double>"
    )


def run(spark, n_docs: int) -> dict:
    seed_ids = list(range(100, 100 + n_docs))
    batch_ids = list(range(1_000_000, 1_000_000 + n_docs))
    batch = _docs(spark, batch_ids).localCheckpoint(eager=True)
    emb = _emb(spark, batch_ids).localCheckpoint(eager=True)

    def fresh_setup(with_indexes: bool):
        root = tempfile.mkdtemp(prefix="ingest_sim_")
        idx, out = os.path.join(root, "idx"), os.path.join(root, "out")
        build_corpus_index(spark, _docs(spark, seed_ids), idx)
        if not with_indexes:
            return idx, out, None, None
        ann, ivf = os.path.join(root, "ann"), os.path.join(root, "ivf")
        build_ann_index(spark, _emb(spark, seed_ids), ann)
        build_ivf_index(spark, _emb(spark, seed_ids), ivf)
        return idx, out, ann, ivf

    def timed_ingest(setup):
        idx, out, ann, ivf = setup
        drain_driver_backlog(spark)
        t0 = time.perf_counter()
        m = ingest_batch(
            spark, batch, idx, out, batch_id=1, stream="s",
            batch_emb=emb if ann else None,
            ann_index_dir=ann, ivf_index_dir=ivf,
        )
        sec = round(time.perf_counter() - t0, 2)
        assert m["appended"] == n_docs, m
        return sec

    # ABBA ordering with fresh state per measurement: a single
    # base-then-integrated pair runs the integrated arm on a strictly
    # warmer JVM and understates the overhead. Per-arm MIN over the
    # interleaved pairs bounds the residual bias in the CONSERVATIVE
    # direction (the base arm holds the warmest slot, so if anything
    # the reported overhead is slightly overstated)
    #
    # Load-awareness (r14, VERDICT r13 item 5): every r13 reading was
    # host-load noise around the true overhead. A pair measured under
    # a background-load burst has an inflated base arm, so pairs
    # whose base deviates > 15% from the observed base MIN are
    # REJECTED and replaced (up to SIM_MAX_PAIRS) until SIM_PAIRS
    # accepted pairs exist; the reported overhead uses accepted arms
    # only, and rejections ship in the artifact.
    pairs_target = int(os.environ.get("SIM_PAIRS", "2"))
    max_pairs = int(os.environ.get("SIM_MAX_PAIRS", "6"))
    tol = 1.15
    pair_recs: list[dict] = []
    first_integ = None
    while len(pair_recs) < max_pairs:
        p = len(pair_recs)
        setups = {"base": fresh_setup(False), "integ": fresh_setup(True)}
        if first_integ is None:
            first_integ = setups["integ"]
        # ABBA chain (A B | B A | A B ...): alternating pair order so
        # neither arm systematically holds the warmer slot — base
        # takes the coldest AND warmest slots, biasing the reported
        # overhead conservative (r11 discipline)
        rec = {}
        order = ("base", "integ") if p % 2 == 0 else ("integ", "base")
        for arm in order:
            rec[arm] = timed_ingest(setups[arm])
        pair_recs.append(rec)
        base_min = min(r["base"] for r in pair_recs)
        accepted = [r for r in pair_recs if r["base"] <= tol * base_min]
        if len(accepted) >= pairs_target:
            break
    base_min = min(r["base"] for r in pair_recs)
    accepted = [r for r in pair_recs if r["base"] <= tol * base_min]
    rejected = [r for r in pair_recs if r["base"] > tol * base_min]
    base_times = [r["base"] for r in accepted]
    integ_times = [r["integ"] for r in accepted]
    base_sec, integ_sec = min(base_times), min(integ_times)
    _, _, ann, ivf = first_integ

    # post-ingest probes answer over the FULL corpus: an exact-vector
    # query's top-1 must be the ingested doc at cosine 1.0
    probe_id = batch_ids[n_docs // 2]
    q = _emb(spark, [probe_id]).select(
        F.lit(0).cast("long").alias("vec_id"), "v"
    )
    for fn, d in ((probe_ann_index, ann), (probe_ivf_index, ivf)):
        top = fn(spark, q, d).filter(F.col("rank") == 1).collect()
        assert top and top[0]["neighbor_id"] == probe_id, (fn, top)
        assert abs(top[0]["cosine"] - 1.0) < 1e-6

    total = n_docs * 2
    assert read_ann_manifest(ann)["rows"] == total
    assert read_ivf_manifest(ivf)["rows"] == total
    return {
        "n_docs": n_docs,
        "ingest_base_sec": base_sec,
        "ingest_with_indexes_sec": integ_sec,
        "ingest_base_times": base_times,
        "ingest_with_indexes_times": integ_times,
        "index_overhead_frac": round(integ_sec / base_sec - 1, 3),
        "load_rejection_rule": (
            f"pair accepted iff base_sec <= {tol} * min(base_sec); "
            "rejected pairs replaced up to SIM_MAX_PAIRS"
        ),
        "pairs_run": len(pair_recs),
        "pairs_accepted": len(accepted),
        "rejected_pairs": rejected,
        "post_ingest_probe_parity": True,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spark = get_spark("stress-ingest-sim")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, n)))


if __name__ == "__main__":
    main()
