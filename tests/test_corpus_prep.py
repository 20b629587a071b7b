"""End-to-end corpus-prep pipeline: the manifest's attrition must
tile docs_in exactly, every stage's numbers must agree with the
independently oracle-checked report queries, and the materialized
artifacts must be internally consistent (no PII left, packs tile the
token stream)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.llm_prep import EMAIL_PATTERN
from irio2024_mapreduce_spark.plans.corpus_prep import prepare_corpus
from irio2024_mapreduce_spark.sources.tables import load_table


def test_prepare_corpus_manifest_and_artifacts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "prepared")
    m = prepare_corpus(spark, sf_dir, out)

    # attrition tiles docs_in exactly — every doc killed once or kept
    assert m["docs_in"] == (
        m["exact_dups_removed"]
        + m["killed_null_text"]
        + m["killed_too_short"]
        + m["killed_too_repetitive"]
        + m["killed_no_stopwords"]
        + m["docs_out"]
    )

    # stage-1 parity with the oracle-checked dedup_exact report:
    # dups removed == docs − distinct texts (NULLs exempt)
    docs = load_table(spark, sf_dir, "documents")
    non_null = docs.filter(F.col("text").isNotNull())
    distinct_texts = non_null.select("text").distinct().count()
    assert m["exact_dups_removed"] == non_null.count() - distinct_texts

    # artifacts: survivors are scrubbed (no email survives the regex
    # the scrubber is oracle-checked with) and carry positive tokens
    cleaned = spark.read.parquet(f"{out}/clean_documents.parquet")
    assert cleaned.count() == m["docs_out"]
    pat = re.compile(EMAIL_PATTERN)
    leftover = [
        r["text"] for r in cleaned.collect() if pat.search(r["text"] or "")
    ]
    assert leftover == []

    # packs tile the cleaned token stream gaplessly
    packs = sorted(
        spark.read.parquet(f"{out}/packs.parquet").collect(),
        key=lambda r: r["seq_offset"],
    )
    assert len(packs) == m["docs_out"]
    pos = 0
    for r in packs:
        assert r["seq_offset"] == pos
        pos += r["n_tokens"]
    assert pos == m["total_tokens"]
    assert m["n_packs"] >= 1
