"""Cross-operator consistency over the shared documents corpus.

Each LLM-prep operator slices `documents` with its own stripe/NULL
convention (eval stripe %10==8, ingest batch %10==9, target sample
%10==7, NULL-text exclusions). Per-operator oracles can't see DRIFT
between those conventions — e.g. one operator silently changing its
stripe would still hash-match its own oracle. These invariants tie
the reports together against one independently-computed census.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def census(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    rows = docs.collect()
    return {
        "total": len(rows),
        "non_null": sum(1 for r in rows if r["text"] is not None),
        "by_source": {
            s: sum(1 for r in rows if r["source"] == s)
            for s in {r["source"] for r in rows}
        },
        "eval_stripe": sum(1 for r in rows if r["doc_id"] % 10 == 8),
        "batch_stripe": sum(1 for r in rows if r["doc_id"] % 10 == 9),
        "target_stripe": sum(1 for r in rows if r["doc_id"] % 10 == 7),
        "non_target_non_null_by_source": {
            s: sum(
                1
                for r in rows
                if r["source"] == s
                and r["doc_id"] % 10 != 7
                and r["text"] is not None
            )
            for s in {r["source"] for r in rows}
        },
        "ws_tokens_total": sum(
            len(r["text"].split(" ")) for r in rows if r["text"] is not None
        ),
    }


def test_dedup_exact_partitions_the_corpus(spark, sf_dir, census):
    from irio2024_mapreduce_spark.operators.dedup import dedup_exact

    rows = dedup_exact(spark, sf_dir).collect()
    # every doc belongs to exactly one hash group
    assert sum(r["dup_cnt"] for r in rows) == census["total"]


def test_decontaminate_covers_the_training_pool(spark, sf_dir, census):
    from irio2024_mapreduce_spark.operators.llm_prep import decontaminate

    rows = decontaminate(spark, sf_dir).collect()
    assert sum(r["n_train_docs"] for r in rows) == (
        census["total"] - census["eval_stripe"]
    )
    for r in rows:
        assert r["n_contaminated"] + r["n_clean"] == r["n_train_docs"]


def test_incremental_verdicts_cover_the_batch_stripe(
    spark, sf_dir, census
):
    from irio2024_mapreduce_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_lsh,
    )

    for fn in (dedup_incremental, dedup_incremental_lsh):
        rows = fn(spark, sf_dir).collect()
        assert len(rows) == census["batch_stripe"], fn.__name__


def test_importance_resample_scores_the_raw_pool(spark, sf_dir, census):
    from irio2024_mapreduce_spark.operators.llm_prep import (
        importance_resample,
    )

    rows = importance_resample(spark, sf_dir).collect()
    got = {r["source"]: r["docs_in"] for r in rows}
    want = {
        s: n
        for s, n in census["non_target_non_null_by_source"].items()
        if n > 0
    }
    assert got == want
    for r in rows:
        assert 0 <= r["docs_admitted"] <= r["docs_in"]


def test_pack_sequences_conserves_tokens(spark, sf_dir, census):
    from irio2024_mapreduce_spark.operators.llm_prep import pack_sequences

    rows = pack_sequences(spark, sf_dir).collect()
    assert len(rows) == census["total"]
    assert sum(r["n_tokens"] for r in rows) == census["ws_tokens_total"]
    # offsets tile the token stream exactly: sorted by offset, each
    # doc starts where the previous ended
    rows = sorted(rows, key=lambda r: r["seq_offset"])
    pos = 0
    for r in rows:
        assert r["seq_offset"] == pos
        pos += r["n_tokens"]


def test_source_mix_and_quality_cover_all_sources(spark, sf_dir, census):
    from irio2024_mapreduce_spark.operators.llm_prep import source_mix
    from irio2024_mapreduce_spark.operators.text_analysis import (
        quality_repetition,
    )

    mix = source_mix(spark, sf_dir).collect()
    assert {r["source"]: r["docs_in"] for r in mix} == census["by_source"]
    assert quality_repetition(spark, sf_dir).count() == census["non_null"]
