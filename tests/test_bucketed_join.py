"""Bucketed-table co-located join — the answer to "orders ⋈ lineitem
shuffles 100 TB" (see sources/sinks.py::write_bucketed_table).

Writing both fact tables bucketed by the join key persists a
co-located hash partitioning, so the subsequent join plans with NO
Exchange on either side: each task joins bucket i ⋈ bucket i straight
off storage. This test proves the claim on the real plan, not just in
prose.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.sources.sinks import write_bucketed_table
from irio2024_mapreduce_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    # the fixtures are tiny, so the planner would broadcast and the
    # co-location claim would never be exercised — force the shuffle
    # family of joins for this module
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"], path=str(warehouse / "b_orders"),
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "lo_key"),
        "b_lineitem", ["lo_key"], n_buckets=8, sort_cols=["lo_key"],
        path=str(warehouse / "b_lineitem"),
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("lo_key") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(joined)
    # formatted explain prints the tree ROOT-FIRST, so everything
    # after the join line (within the tree section) is the join's
    # input subtree — exactly where a shuffle would sit. Splitting
    # before the first HashAggregate would inspect only the header.
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, tree
    marker = "SortMergeJoin" if "SortMergeJoin" in tree else "ShuffledHashJoin"
    below_join = tree.split(marker, 1)[1]
    # co-located buckets: the join consumes storage partitioning
    # directly — any Exchange below the join is the 100 TB shuffle
    # the bucketing exists to remove
    assert "Exchange" not in below_join, below_join
    # sanity against a vacuous split: the join inputs (scans) must
    # actually be visible in the inspected section
    assert "Scan" in below_join, below_join


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    bucketed = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("lo_key") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
