"""E25 — word count re-expressed through the pluggable step surface.

Must produce results identical to E1 (same oracle SQL): the map step
is a user-supplied pandas function (the reference's custom-worker
analog, ``mapreduce/worker/algorithm.py:5-11``), the reduce step is a
plain DataFrame aggregation (``:13-23``), chained by the named-step
graph the reference drives from ``ALGORITHM_STEPS``
(``mapreduce/coordinator/algorithm.py:142-166``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.functions.text import TOKEN_SPLIT_REGEX
from irio2024_mapreduce_spark.plans.pipeline import Pipeline, pandas_partition_step
from irio2024_mapreduce_spark.registry import WORDCOUNT_ORACLE
from irio2024_mapreduce_spark.sources.tables import load_table, load_table_parallel

# re.ASCII: Python \s is Unicode-aware by default (\xa0,  ...),
# but the Java/RE2 twins (E1 wordcount, the DuckDB oracle) split on
# ASCII whitespace only — without the flag this map step diverges on
# any document containing non-ASCII whitespace.
_TOKEN_RE = re.compile(TOKEN_SPLIT_REGEX, re.ASCII)


def _map_tokenize(batch: pd.DataFrame) -> pd.DataFrame:
    """User map step: text rows → one row per token (word, 1)."""
    words = batch["value"].str.split(_TOKEN_RE).explode()
    words = words[words.str.len() > 0]
    return pd.DataFrame({"word": words, "count": 1})


def _reduce_count(df: DataFrame) -> DataFrame:
    return df.groupBy("word").agg(F.sum("count").alias("cnt"))


def custom_step_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        F.col("text").alias("value")
    )
    pipeline = (
        Pipeline()
        .add_step(
            "map",
            pandas_partition_step(_map_tokenize, "word string, count long"),
            next_step="reduce",
        )
        .add_step("reduce", _reduce_count)
    )
    return pipeline.run(docs)


ORACLE_SQL = {"custom_step_udf": WORDCOUNT_ORACLE}
QUERIES = {"custom_step_udf": custom_step_udf}
