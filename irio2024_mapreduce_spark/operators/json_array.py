"""Semi-structured operators — SURVEY.md §2.3 E15 (JSON), E16 (array/map).

All JVM-side builtins (``get_json_object``, ``from_json``, array
functions) — JSON parsing happens inside codegen'd expressions, never
in Python. At 100 TB, prefer ``from_json`` with an explicit schema
over repeated ``get_json_object`` calls on the same column: one parse
per row instead of one per extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from irio2024_mapreduce_spark.sources.tables import load_table

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON extraction from events.props + an aggregate over
    the extracted value (proves the extraction feeds the planner)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        "event_type",
        # try_cast: null on malformed values, matching the oracle's
        # TRY_CAST (a strict ANSI cast would abort the whole query on
        # one dirty row)
        F.get_json_object("props", "$.k").try_cast("long").alias("k_int"),
        F.from_json("props", PROPS_SCHEMA)["k"].alias("k_parsed"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("k_int").alias("sum_k"),
            F.sum("k_parsed").alias("sum_k_parsed"),
            F.min("k_int").alias("min_k"),
            F.max("k_int").alias("max_k"),
        )
        .orderBy("event_type")
    )


def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function pack over tokenized documents (split, size,
    contains, distinct, sort, element_at). Map-typed columns are
    exercised in tests (DuckDB map comparison over the driver's
    hash is not portable — SURVEY E16 'mostly')."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique"),
        F.element_at(tokens, 1).alias("first_token"),
        F.element_at(tokens, -1).alias("last_token"),
        F.element_at(F.array_sort(F.array_distinct(tokens)), 1).alias(
            "min_token"
        ),
    )


ORACLE_SQL = {
    "json_extract": """
        SELECT event_type,
               COUNT(*)                                                 AS cnt,
               SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k_parsed,
               MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "array_ops": """
        SELECT doc_id,
               len(string_split(text, ' '))::BIGINT                    AS n_tokens,
               list_contains(string_split(text, ' '), 'spark')         AS has_spark,
               len(list_distinct(string_split(text, ' ')))::BIGINT     AS n_unique,
               string_split(text, ' ')[1]                              AS first_token,
               string_split(text, ' ')[-1]                             AS last_token,
               list_sort(list_distinct(string_split(text, ' ')))[1]    AS min_token
        FROM documents
    """,
}

QUERIES = {
    "json_extract": json_extract,
    "array_ops": array_ops,
}
