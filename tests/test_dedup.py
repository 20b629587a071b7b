"""Dedup pack tests: determinism, recall vs exact ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import (
    _jaccard,
    _shingles,
    dedup_near,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from irio2024_mapreduce_spark.sources.tables import load_table


def _exact_pairs(spark, sf_dir, threshold=0.5) -> set[tuple[int, int]]:
    """Ground truth: full O(n²) shingle-Jaccard (test-only)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _shingles().alias("sh")
    )
    l, r = docs.alias("l"), docs.alias("r")
    pairs = (
        l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            _jaccard(F.col("l.sh"), F.col("r.sh")).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )
    return {(r["a"], r["b"]) for r in pairs.collect()}


def test_minhash_recall_and_precision(spark, sf_dir):
    truth = _exact_pairs(spark, sf_dir, 0.5)
    found = {
        (r["doc_a"], r["doc_b"]) for r in dedup_near(spark, sf_dir).collect()
    }
    # verification step makes precision exact; LSH may miss borderline
    # pairs, but must catch the vast majority at j>=0.5 with b=8,r=4
    assert found <= truth
    if truth:
        assert len(found) / len(truth) >= 0.8


def test_minhash_deterministic(spark, sf_dir):
    a = sorted(map(tuple, dedup_near(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_near(spark, sf_dir).collect()))
    assert a == b


def test_simhash_pairs_are_near_dups(spark, sf_dir):
    """SimHash hits at hamming≤3 should overwhelmingly be true
    near-dups under the exact-Jaccard measure."""
    truth = _exact_pairs(spark, sf_dir, 0.3)
    found = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_simhash(spark, sf_dir).collect()
    }
    if found:
        hits = len(found & truth)
        assert hits / len(found) >= 0.9


def test_ngram_banding_subset_of_truth(spark, sf_dir):
    truth = _exact_pairs(spark, sf_dir, 0.5)
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    # banding only prunes candidates — it can never invent pairs
    assert banded <= truth
