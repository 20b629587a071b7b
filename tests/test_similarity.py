"""Similarity search tests: ANN vs exact recall, score sanity."""

from __future__ import annotations

from irio2024_mapreduce_spark.operators.similarity import (
    TOP_K,
    similarity_ann,
    similarity_topk,
)


def test_topk_shape_and_bounds(spark, sf_dir):
    rows = similarity_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0
        assert 1 <= r["rank"] <= TOP_K
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == TOP_K
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_ann_is_subset_scoring_consistent(spark, sf_dir):
    """ANN results must carry the same cosine the exact path computes
    for that (query, neighbor) pair."""
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity_topk(spark, sf_dir).collect()
    }
    for r in similarity_ann(spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_all:
            assert abs(r["cosine"] - exact_all[key]) < 1e-9


def test_ivf_deterministic_and_scored_consistently(spark, sf_dir):
    from irio2024_mapreduce_spark.operators.similarity import similarity_ivf

    a = sorted(map(tuple, similarity_ivf(spark, sf_dir).collect()))
    b = sorted(map(tuple, similarity_ivf(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
    # cosines must match the exact path for shared (query, neighbor)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity_topk(spark, sf_dir).collect()
    }
    for qid, nid, cos, _rank in a:
        if (qid, nid) in exact:
            assert abs(cos - exact[(qid, nid)]) < 1e-9


def test_ivf_recall_beats_random(spark, sf_dir):
    """Probing 2/8 cells must recall more of the true top-k than the
    ~25% a random 2-cell probe would give on structure-less data."""
    from irio2024_mapreduce_spark.operators.similarity import (
        TOP_K,
        similarity_ivf,
    )

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity_topk(spark, sf_dir).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity_ivf(spark, sf_dir).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.3, recall


def test_ann_recall_floor(spark, sf_dir):
    """Bucketed search trades recall for 2^H× less work; with H=8
    random hyperplanes on random-ish vectors recall is modest — just
    assert the machinery returns plausible hits, deterministically."""
    a = sorted(map(tuple, similarity_ann(spark, sf_dir).collect()))
    b = sorted(map(tuple, similarity_ann(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0
