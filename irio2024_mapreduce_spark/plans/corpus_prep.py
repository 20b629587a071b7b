"""End-to-end corpus preparation — the materializing pipeline a
training-data team actually runs, composed from the oracle-checked
operator stages (single source of truth: each stage reuses the same
column helpers its report query is hash-verified with):

1. **exact dedup** — one representative (min doc_id) per distinct
   text; NULL-text rows pass through untouched (the funnel owns
   them) so every kill is attributed to exactly one stage.
2. **quality funnel** — `funnel_verdict` first-failing-rule tagging;
   only 'pass' docs survive.
3. **PII scrub** — `scrub_text`'s chained JVM regexp_replace.
4. **sequence packing** — `pack_docs` two-phase distributed prefix
   sum over the CLEANED text's token counts.

Outputs: ``clean_documents.parquet`` (scrubbed survivors) and
``packs.parquet`` (doc → pack assignment), plus a manifest dict of
per-stage attrition — the numbers every run must ship with.

Scale shape: stages 1–3 are one window/agg on 32-byte digests plus
map-only expressions; stage 4 is the pinned two-phase scan. Nothing
here collects to the driver except the manifest's counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from irio2024_mapreduce_spark.operators.llm_prep import pack_docs, scrub_text
from irio2024_mapreduce_spark.operators.text_analysis import funnel_verdict
from irio2024_mapreduce_spark.sources.tables import load_table


def prepare_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, int]:
    """Run the cleaning pipeline over ``{sf_dir}/documents.parquet``
    and write the cleaned + packed corpus under ``out_dir``. Returns
    the attrition manifest."""
    docs = load_table(spark, sf_dir, "documents")
    docs_in = docs.count()

    # stage 1: exact dedup (NULL texts exempt — the funnel kills and
    # counts them; exempting keeps stage attribution disjoint)
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        docs.filter(F.col("text").isNotNull())
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_rank")
        .unionByName(docs.filter(F.col("text").isNull()))
    )
    after_dedup = deduped.count()

    # stage 2: quality funnel
    tagged = deduped.withColumn("_verdict", funnel_verdict())
    kills = {
        r["_verdict"]: r["cnt"]
        for r in tagged.groupBy("_verdict").agg(F.count("*").alias("cnt")).collect()
    }
    survivors = tagged.filter(F.col("_verdict") == "pass").drop("_verdict")

    # stage 3: PII scrub — survivors' text replaced by clean_text
    cleaned = scrub_text(survivors).select(
        "doc_id",
        F.col("clean_text").alias("text"),
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias(
            "n_redactions"
        ),
        *[c for c in survivors.columns if c not in ("doc_id", "text")],
    )
    clean_path = os.path.join(out_dir, "clean_documents.parquet")
    cleaned.write.mode("overwrite").parquet(clean_path)
    cleaned = spark.read.parquet(clean_path)  # packing reads the artifact

    # stage 4: pack the cleaned corpus
    packs = pack_docs(spark, cleaned)
    packs_path = os.path.join(out_dir, "packs.parquet")
    packs.write.mode("overwrite").parquet(packs_path)
    packs = spark.read.parquet(packs_path)

    agg = packs.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("pack_id").alias("n_packs"),
    ).collect()[0]
    n_redactions = cleaned.agg(
        F.sum("n_redactions").alias("s")
    ).collect()[0]["s"]

    return {
        "docs_in": docs_in,
        "exact_dups_removed": docs_in - after_dedup,
        "killed_null_text": kills.get("null_text", 0),
        "killed_too_short": kills.get("too_short", 0),
        "killed_too_repetitive": kills.get("too_repetitive", 0),
        "killed_no_stopwords": kills.get("no_stopwords", 0),
        "docs_out": int(agg["docs"]),
        "pii_redactions": int(n_redactions or 0),
        "total_tokens": int(agg["tokens"]),
        "n_packs": int(agg["n_packs"]),
    }
