"""Parquet table sources for the synthetic star schema (TESTDATA.md).

The reference's only source is "every text blob under a GCS prefix"
(``mapreduce/coordinator/algorithm.py:19-68``, R1/R10 in SURVEY.md
§2.1) — on Spark that is a one-line multi-file read, provided by
:func:`read_text_dir`. The star-schema tables are columnar parquet;
we read them lazily so Catalyst prunes columns and pushes filters
into the scan (check ``.explain``: ``ReadSchema`` / ``PushedFilters``).

Scale note: at 100 TB these directories are thousands of parquet
files; ``spark.sql.files.maxPartitionBytes`` (128 MiB) controls split
planning — the reference's hand-rolled byte-range splitter
(``algorithm.py:30-57``) has no analog here because the datasource
does split planning natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.session import ensure_session_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-size in TPC-H-style schemas.
BROADCAST_SAFE = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table; no action triggered.

    ``events.ts`` is parquet TIMESTAMP(NANOS,false) — Spark has no
    nanosecond timestamp type, so (with
    ``spark.sql.legacy.parquet.nanosAsLong``) it scans as int64 and we
    truncate to microseconds here, exactly like DuckDB/pandas do when
    downcasting ns→µs. The cast is a codegen'd expression on top of
    the scan; column pruning still reaches parquet.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def load_table_parallel(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Scan + round-robin repartition to the session's parallelism.

    The test fixtures are single-row-group parquet files, which scan
    as ONE partition — so any expression-heavy narrow stage (shingle
    building, minhash, per-row cosine, pandas UDFs) would run on one
    core. Production inputs arrive in many splits and don't need
    this; the repartition reproduces that layout locally. Use for
    compute-bound per-row operators; plain aggregations stay on
    :func:`load_table` (their partial-agg is cheaper than a shuffle
    of the raw rows).
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Reference R1+R10: all text files under a directory as one dataset.

    Each file is read line-by-line into a ``value: string`` column;
    files never bleed into each other (the reference guards the same
    invariant by splitting per-blob —
    ``mapreduce/coordinator/algorithm.py:26-32``).
    """
    return spark.read.text(path)
