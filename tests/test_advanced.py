"""Advanced operator edge cases — chiefly as-of join semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof(spark, left_rows, right_rows):
    """Miniature of operators/advanced.py::join_asof on toy data."""
    left = spark.createDataFrame(left_rows, ["id", "user_id", "ts"]).select(
        "id",
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("p_value"),
        F.lit(0).alias("is_right"),
    )
    right = spark.createDataFrame(right_rows, ["user_id", "ts", "v"]).select(
        F.lit(None).cast("long").alias("id"),
        "user_id",
        "ts",
        F.col("v").alias("p_value"),
        F.lit(1).alias("is_right"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        left.unionByName(right)
        .select(
            "id",
            "is_right",
            F.last("p_value", ignorenulls=True).over(w).alias("asof_v"),
        )
        .filter(F.col("is_right") == 0)
    )
    return {r["id"]: r["asof_v"] for r in out.collect()}


def t(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_exact_tie_is_matched(spark):
    """ASOF `ts >= p.ts` semantics: a right row AT the left timestamp
    matches (right sorts before left at equal ts)."""
    got = _asof(
        spark,
        [(1, 7, t(10))],
        [(7, t(10), 42.0)],
    )
    assert got == {1: 42.0}


def test_asof_takes_latest_prior_not_any(spark):
    got = _asof(
        spark,
        [(1, 7, t(30))],
        [(7, t(10), 1.0), (7, t(20), 2.0), (7, t(40), 3.0)],
    )
    assert got == {1: 2.0}  # latest <= 30 is t(20); t(40) is future


def test_asof_no_prior_is_null(spark):
    got = _asof(
        spark,
        [(1, 7, t(5)), (2, 8, t(50))],
        [(7, t(10), 1.0)],
    )
    assert got == {1: None, 2: None}  # user 8 has no purchases at all


def test_asof_users_isolated(spark):
    got = _asof(
        spark,
        [(1, 7, t(30)), (2, 8, t(30))],
        [(7, t(10), 1.0), (8, t(20), 2.0)],
    )
    assert got == {1: 1.0, 2: 2.0}


def test_stats_pack_values_sane(spark, sf_dir):
    from irio2024_mapreduce_spark.operators.advanced import stats_pack

    for r in stats_pack(spark, sf_dir).collect():
        assert r["sd_price"] > 0
        assert -1.0 <= r["corr_qty_price"] <= 1.0
        assert r["median_price"] <= r["p90_price"]


def test_sketches_error_bounds(spark, sf_dir):
    """Approximate aggregates must land within 5% of their exact
    twins computed in the same row — asserted at MULTIPLE scale
    factors, not just the test default: sketch error is
    data-dependent (HLL++ register collisions and t-digest centroid
    merging both change with cardinality), so a bound that holds at
    sf0.001 is no evidence for sf0.1."""
    import os

    from irio2024_mapreduce_spark.operators.misc import sketches

    sf_dirs = [sf_dir] + [
        d
        for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
        if d != sf_dir and os.path.exists(d)
    ]
    for d in sf_dirs:
        rows = sketches(spark, d).collect()
        assert rows, f"sketches returned no groups at {d}"
        for r in rows:
            assert abs(r["approx_orders"] - r["exact_orders"]) <= max(
                0.05 * r["exact_orders"], 2
            ), f"HLL error out of bound at {d}: {r}"
            assert (
                abs(r["approx_median"] - r["exact_median"])
                <= 0.05 * r["exact_median"]
            ), f"quantile sketch error out of bound at {d}: {r}"


def test_pivot_counts_sum_to_total(spark, sf_dir):
    from irio2024_mapreduce_spark.operators.advanced import (
        pivot_status_priority,
    )
    from irio2024_mapreduce_spark.sources.tables import load_table

    rows = pivot_status_priority(spark, sf_dir).collect()
    total = sum(
        sum(r[c] for c in r.asDict() if c.startswith("prio_")) for r in rows
    )
    assert total == load_table(spark, sf_dir, "orders").count()


# ------------------------------------------------- two-phase quantile edges
def _quantiles_via_spark_builtin(spark, rows):
    """Ground truth: Spark's exact percentile aggregate (quantile_cont
    definition) on the same data."""
    df = spark.createDataFrame(rows, ["l_returnflag", "l_extendedprice"])
    return {
        r["l_returnflag"]: (r["m"], r["p"])
        for r in df.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("m"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p"),
        )
        .collect()
    }


def _quantiles_via_histogram(spark, rows):
    from irio2024_mapreduce_spark.operators.advanced import _exact_quantiles

    df = spark.createDataFrame(rows, ["l_returnflag", "l_extendedprice"])
    return {
        r["l_returnflag"]: (r["median_price"], r["p90_price"])
        for r in _exact_quantiles(df).collect()
    }


def test_two_phase_quantile_edge_cases(spark):
    """The histogram rank must agree with the exact percentile
    aggregate on the shapes where off-by-one rank bugs live: single
    rows, two rows, all-equal values, values straddling bucket
    boundaries, and ranks whose lo/lo+1 brackets sit in DIFFERENT
    buckets (63.9 vs 64.1 with bucket width 64)."""
    cases = [
        ("single", [1234.56]),
        ("two", [10.0, 20.0]),
        ("equal", [64.0] * 7),
        ("boundary", [63.9, 63.95, 64.0, 64.05, 64.1]),
        ("cross_bucket", [1.0, 63.9, 64.1, 200.0, 500.0, 1000.0]),
        ("frac_zero", [1.0, 2.0, 3.0, 4.0, 5.0]),  # 0.5*(n-1) integral
    ]
    rows = [(k, v) for k, vals in cases for v in vals]
    want = _quantiles_via_spark_builtin(spark, rows)
    got = _quantiles_via_histogram(spark, rows)
    assert got == want, {k: (got.get(k), want.get(k)) for k in want}
