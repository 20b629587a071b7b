"""Leakage quarantine (r9 verdict item 5): the audit's acting half.
Planted train↔eval straddlers must be quarantined so the post-pipeline
leakage report reads ZERO in every train↔eval cell — exact and near —
while eval composition stays untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import (
    ngram_jaccard_pairs_docs,
)
from irio2024_mapreduce_spark.operators.llm_prep import (
    leakage_quarantine_ids,
    leakage_report,
)
from irio2024_mapreduce_spark.plans.corpus_prep import prepare_corpus

# a near pair the n-gram audit catches (3-gram jaccard ~0.65) that the
# LSH family's banding deterministically MISSES — found by sweeping
# one-token edits; this is exactly the family-mismatch leak the
# quarantine exists for (stage 2 under family='lsh' does not kill it)
BASE = ("quiet rivers carry old stories past sleeping farms toward "
        "the wide grey sea every single morning")
NEAR = ("quiet rivers carry old lantern past sleeping farms toward "
        "the wide grey sea every single morning")
FILLERS = [
    "the night train rattled past sleeping towns carrying mail and "
    "quiet travellers north through the dark",
    "the fishing village woke before dawn as boats slipped quietly "
    "into the grey harbor water again",
    "an old gardener counted seeds in the shed while rain tapped a "
    "slow rhythm on the tin roof",
    "the mountain trail crossed seven wooden bridges before reaching "
    "the snowy summit ridge at noon",
]
# md5(doc_id)-based split assignment (lang=en): 27/63 -> test,
# 59 -> val, 1..5 -> train (pinned by split_docs' content addressing)
TEST_ID, TEST_ID2, VAL_ID = 27, 63, 59


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def _cells(report):
    return {
        (r["kind"], r["split_pair"]): r["n_pairs"]
        for r in report.collect()
    }


def test_quarantine_zeroes_all_train_eval_cells(spark):
    """Manually tagged frame with every straddler kind planted:
    exact train↔test, near train↔test, near val↔train. After
    quarantine: all four train↔eval cells zero, eval rows untouched."""
    rows = [
        (1, BASE, "train"),
        (2, BASE, "test"),  # exact straddler: train member 1 must go
        (3, NEAR, "train"),  # near straddler vs 2's group? no — vs BASE
        (4, FILLERS[0], "val"),
        (5, FILLERS[0] + " tonight", "train"),  # near straddler vs val
        (6, FILLERS[1], "train"),  # clean train doc stays
        (7, FILLERS[2], "test"),  # clean test doc stays
    ]
    tagged = spark.createDataFrame(
        [(i, t, s) for i, t, s in rows],
        "doc_id long, text string, split string",
    )
    q = {r["doc_id"] for r in leakage_quarantine_ids(tagged).collect()}
    assert q == {1, 3, 5}  # exactly the train-side straddlers

    cleaned = tagged.withColumn(
        "split",
        F.when(F.col("doc_id").isin(sorted(q)), "quarantined").otherwise(
            F.col("split")
        ),
    )
    rep = _cells(
        leakage_report(
            cleaned, ngram_jaccard_pairs_docs(cleaned).select(
                "doc_a", "doc_b"
            )
        )
    )
    for kind in ("exact", "near"):
        assert rep[(kind, "test|train")] == 0
        assert rep[(kind, "train|val")] == 0
    # eval composition untouched
    left = {
        (r["doc_id"], r["split"]) for r in cleaned.collect()
    }
    assert (2, "test") in left and (4, "val") in left
    assert (7, "test") in left and (6, "train") in left


def test_pipeline_quarantines_planted_straddler(spark, tmp_path):
    """End-to-end: a corpus whose planted near pair SURVIVES stage 2
    under family='lsh' (the banding misses it) and straddles the
    content-addressed split. quarantine_leaks=True must ship an
    artifact whose train↔eval leakage cells read zero, with the
    train-side member re-tagged 'quarantined' and excluded from
    packs; the control run (quarantine off) shows the leak."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rows = [(1, BASE), (TEST_ID, NEAR), (TEST_ID2, FILLERS[0])] + [
        (i + 2, FILLERS[i + 1]) for i in range(3)
    ]
    _docs(spark, rows).write.parquet(os.path.join(sf, "documents.parquet"))

    # control: the leak ships
    out0 = str(tmp_path / "out0")
    prepare_corpus(
        spark, sf, out0, holdout_split=True, near_family="lsh"
    )
    art0 = spark.read.parquet(
        os.path.join(out0, "clean_documents.parquet")
    )
    rep0 = _cells(
        leakage_report(
            art0, ngram_jaccard_pairs_docs(art0).select("doc_a", "doc_b")
        )
    )
    assert rep0[("near", "test|train")] == 1  # the planted straddler

    # quarantine: the leak is gone, charged in the manifest
    out1 = str(tmp_path / "out1")
    m = prepare_corpus(
        spark, sf, out1, holdout_split=True, near_family="lsh",
        quarantine_leaks=True,
    )
    assert m["quarantined_docs"] == 1
    art1 = spark.read.parquet(
        os.path.join(out1, "clean_documents.parquet")
    )
    rep1 = _cells(
        leakage_report(
            art1, ngram_jaccard_pairs_docs(art1).select("doc_a", "doc_b")
        )
    )
    for kind in ("exact", "near"):
        assert rep1[(kind, "test|train")] == 0
        assert rep1[(kind, "train|val")] == 0
    splits = {
        r["doc_id"]: r["split"] for r in art1.select(
            "doc_id", "split"
        ).collect()
    }
    assert splits[1] == "quarantined"  # the train-side member
    assert splits[TEST_ID] == "test"  # eval side untouched
    # quarantined docs never enter the training packs
    packs = spark.read.parquet(os.path.join(out1, "packs.parquet"))
    assert packs.filter(F.col("doc_id") == 1).count() == 0
