"""Pipeline (R11/R12 parity surface) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.pipeline_queries import custom_step_udf
from irio2024_mapreduce_spark.plans.pipeline import Pipeline, pandas_partition_step
from irio2024_mapreduce_spark.registry import wordcount_query


def test_step_graph_walk_order(spark):
    df = spark.range(5).toDF("x")
    p = (
        Pipeline()
        .add_step("a", lambda d: d.withColumn("x", F.col("x") + 1), "b")
        .add_step("b", lambda d: d.withColumn("x", F.col("x") * 10))
    )
    assert sorted(r["x"] for r in p.run(df).collect()) == [10, 20, 30, 40, 50]


def test_cycle_detected(spark):
    df = spark.range(1)
    p = (
        Pipeline()
        .add_step("a", lambda d: d, "b")
        .add_step("b", lambda d: d, "a")
    )
    with pytest.raises(ValueError, match="cycle"):
        p.run(df)


def test_unknown_step(spark):
    p = Pipeline().add_step("a", lambda d: d, "ghost")
    with pytest.raises(KeyError, match="ghost"):
        p.run(spark.range(1))


def test_duplicate_step_rejected():
    p = Pipeline().add_step("a", lambda d: d)
    with pytest.raises(ValueError, match="duplicate"):
        p.add_step("a", lambda d: d)


def test_empty_pipeline_rejected(spark):
    with pytest.raises(ValueError, match="no steps"):
        Pipeline().run(spark.range(1))


def test_pandas_partition_step(spark):
    import pandas as pd

    step = pandas_partition_step(
        lambda b: pd.DataFrame({"y": b["id"] * 2}), "y long"
    )
    out = sorted(r["y"] for r in step(spark.range(4)).collect())
    assert out == [0, 2, 4, 6]


def test_custom_step_udf_equals_flagship(spark, sf_dir):
    """E25 contract: pluggable-surface word count == E1 exactly."""
    a = {(r["word"], r["cnt"]) for r in custom_step_udf(spark, sf_dir).collect()}
    b = {(r["word"], r["cnt"]) for r in wordcount_query(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
