"""Multimodal column plumbing — opaque binary payloads + typed
metadata, with decode/feature-extract as Arrow-batched pandas stages.

The image/audio/video libraries are NOT in this container, so the
actual decode is stubbed (``decode_image`` raises
``NotImplementedError`` unless a deterministic fake is requested) —
but everything Spark-side is real and tested: the schema
(``binary`` payload + metadata struct), the ``mapInPandas`` batch
shape, partitioning, and the downstream aggregation.

Scale notes: binary payloads ride Parquet BYTE_ARRAY; the decode
stage is a map-only ``mapInPandas`` (one Arrow batch in, one out —
no shuffle), so a 100 TB media corpus decodes embarrassingly
parallel with ``spark.sql.files.maxPartitionBytes`` controlling task
granularity. Metadata-only queries never touch the payload column
(columnar pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.sources.tables import load_table, load_table_parallel

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "payload_sha string"
)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Real decode needs PIL/libvips — not installed here. ``fake=True``
    derives deterministic dimensions from the payload hash so the
    full pipeline (schema, batching, aggregation) is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    payloads = batch["payload"]
    dims = [decode_image(p, fake=True) for p in payloads]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": payloads.str.len(),
            "width": [w for w, _ in dims],
            "height": [h for _, h in dims],
            "payload_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
        }
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media-shaped table from documents: binary payload
    (UTF-8 of the text — a stand-in for image bytes) + metadata."""
    docs = load_table_parallel(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # a NULL payload has no media bytes
    )
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("orig_chars"),
        ).alias("meta"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage + per-media-type aggregation (rows-only check:
    the stubbed decode isn't expressible in SQL; determinism and
    batch shape are asserted in tests)."""
    media = media_table(spark, sf_dir)
    decoded = media.select("doc_id", "payload", "media_type").mapInPandas(
        lambda it: (_decode_batch(b) for b in it), schema=DECODED_SCHEMA
    )
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
            F.countDistinct("payload_sha").alias("distinct_payloads"),
        )
        .orderBy("media_type")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass over the media table — payload column is
    pruned from the scan entirely; md5/octet_length run on the binary
    column (hash-checked against DuckDB)."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.orig_chars").alias("orig_chars"),
    )


ORACLE_SQL = {
    "multimodal_meta": """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END   AS media_type,
               octet_length(encode(text))::BIGINT AS n_bytes,
               md5(text)                   AS content_md5,
               lang,
               n_chars                     AS orig_chars
        FROM documents
        WHERE text IS NOT NULL
    """,
}

QUERIES = {
    "multimodal_decode": multimodal_decode,
    "multimodal_meta": multimodal_meta,
}
