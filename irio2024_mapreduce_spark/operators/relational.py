"""Relational operator pack — SURVEY.md §2.3 E2–E14.

Every function takes ``(spark, sf_dir)`` and returns an unexecuted
DataFrame; the matching DuckDB oracle SQL lives in ``ORACLE_SQL``
keyed by the same query name. Column aliases match the oracle
exactly (driver hash contract).

Scale notes (these run against ~100 TB in production):

* Aggregations are partial+final ``HashAggregateExec`` — map-side
  combine means shuffle volume is #groups × #partitions, not #rows.
* Small dims (region, nation, part at any SF; customer/supplier at
  test SFs) are broadcast — ``F.broadcast`` where the dimension is
  bounded by schema design, AQE otherwise.
* Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew splitting. At 100 TB you'd bucket both tables by
  orderkey at write time — documented, not hard-coded, since the
  test parquet is unbucketed.
* Double-typed aggregates are rounded identically on both sides
  (Spark and DuckDB sum floats in different orders; per-row
  arithmetic is bit-exact and left unrounded).

Reference parity: the reference has NO relational operators (SURVEY
§2.1 "explicitly absent") — this pack is the declared extension
surface built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from irio2024_mapreduce_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# E2 filter + projection
# --------------------------------------------------------------------------
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; both must reach the parquet scan.

    ``.explain`` shows PushedFilters: [GTE(l_discount,0.05), ...] and a
    4-column ReadSchema — at 100 TB this is the difference between
    scanning 4 columns of a min/max-pruned subset vs the whole table.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )


# --------------------------------------------------------------------------
# E3 multi-aggregate hash aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# E4 distinct aggregate
# --------------------------------------------------------------------------
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) expands to a two-phase aggregate in Spark —
    dedup on (status, custkey) then count; no driver-side set."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_custs"),
            F.count("*").alias("total_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# E5 rollup / grouping sets
# --------------------------------------------------------------------------
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over a dim chain; NULL group markers align with SQL
    ROLLUP semantics on both engines (SURVEY §7 hard-item 6)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("n_name", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# E6 broadcast equi-join
# --------------------------------------------------------------------------
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part is a bounded dim → explicit broadcast: no shuffle of the
    100 TB fact side at all, just a map-side hash join
    (``BroadcastHashJoinExec`` in the plan)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# E7 shuffle join chain (TPC-H Q5 shape)
# --------------------------------------------------------------------------
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact shuffle join (orders⋈lineitem, customer⋈orders) with
    broadcast dims stacked on top. Join order: filters first, dims
    broadcast, facts shuffled once on their natural keys. At 100 TB:
    bucket lineitem+orders on orderkey to eliminate the big shuffle.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    orders_96 = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        lineitem.join(orders_96, lineitem.l_orderkey == orders_96.o_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supplier.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
        .orderBy(F.desc("revenue"))
    )


# --------------------------------------------------------------------------
# E8 left-semi + left-anti join
# --------------------------------------------------------------------------
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins shuffle only the distinct keys of the right
    side (Spark plans LeftSemi as a broadcast of distinct keys when
    small) — never materializes the join product."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_orders = orders.filter(F.col("o_totalprice") > 200000)
    cond = customer.c_custkey == big_orders.o_custkey
    with_big = customer.join(big_orders, cond, "left_semi").select(
        "c_custkey", "c_name", F.lit(True).alias("has_big_order")
    )
    without_big = customer.join(big_orders, cond, "left_anti").select(
        "c_custkey", "c_name", F.lit(False).alias("has_big_order")
    )
    return with_big.unionAll(without_big)


# --------------------------------------------------------------------------
# E9 left outer join + null-safe aggregation (TPC-H Q13 shape)
# --------------------------------------------------------------------------
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return (
        per_cust.groupBy("order_cnt")
        .agg(F.count("*").alias("cust_cnt"))
        .orderBy(F.desc("cust_cnt"), F.desc("order_cnt"))
    )


# --------------------------------------------------------------------------
# E10 ranking window
# --------------------------------------------------------------------------
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by acctbal per nation. Window shuffles once on
    the partition key; the rank filter cuts output before any further
    stage. Deterministic tiebreak on c_custkey."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# E11 running-total window (frame clause)
# --------------------------------------------------------------------------
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("long").alias("order_seq"),
    )


# --------------------------------------------------------------------------
# E12 global sort + limit (top-k)
# --------------------------------------------------------------------------
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plans orderBy+limit as TakeOrderedAndProject — per-
    partition top-k then a k-row merge on the driver; never a full
    global sort. Exactly what you want at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


# --------------------------------------------------------------------------
# E13 set operations
# --------------------------------------------------------------------------
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets, tagged and
    stacked into one result."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionAll(
            c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
        )
        .unionAll(
            # subtract == SQL EXCEPT (distinct) — exceptAll would keep
            # surplus multiplicities instead of removing matched values
            c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
        )
    )


# --------------------------------------------------------------------------
# E14 scalar function pack
# --------------------------------------------------------------------------
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalars + CASE WHEN — all JVM-side builtins,
    whole-stage-codegen'd; zero Python in the row loop."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.round(F.col("o_totalprice"), 0).alias("price_round"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist_100k"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("price_band"),
    )


ORACLE_SQL: dict[str, str] = {
    "filter_project": """
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
               l_extendedprice * (1 - l_discount) AS disc_price
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "agg_groupby": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                            AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                       AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
               ROUND(AVG(l_quantity), 6)                            AS avg_qty,
               ROUND(AVG(l_discount), 6)                            AS avg_disc,
               COUNT(*)                                             AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_distinct": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS distinct_custs,
               COUNT(*)                  AS total_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "agg_rollup": """
        SELECT n_name, o_orderpriority,
               COUNT(*)                      AS order_cnt,
               ROUND(SUM(o_totalprice), 2)   AS sum_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderpriority)
        ORDER BY n_name, o_orderpriority
    """,
    "join_broadcast": """
        SELECT p_brand,
               ROUND(SUM(l_extendedprice), 2) AS revenue,
               COUNT(*)                       AS line_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "join_shuffle": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*)                                          AS line_cnt
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC
    """,
    "join_semi_anti": """
        SELECT c_custkey, c_name, TRUE AS has_big_order
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        UNION ALL
        SELECT c_custkey, c_name, FALSE AS has_big_order
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    "join_outer": """
        SELECT order_cnt, COUNT(*) AS cust_cnt
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY order_cnt
        ORDER BY cust_cnt DESC, order_cnt DESC
    """,
    "window_rank": """
        SELECT c_custkey, c_nationkey, c_acctbal, rn, rnk FROM (
            SELECT c_custkey, c_nationkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
                   RANK()       OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
            FROM customer
        ) WHERE rn <= 3
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_spend,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS order_seq
        FROM orders
    """,
    "sort_limit_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "set_ops": """
        SELECT 'union' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey FROM supplier)
    """,
    "scalar_funcs": """
        SELECT o_orderkey,
               UPPER(o_orderstatus)                          AS status_u,
               SUBSTRING(o_orderpriority, 1, 1)              AS prio_code,
               o_orderstatus || '-' || o_orderpriority       AS status_prio,
               LENGTH(o_orderpriority)                       AS prio_len,
               YEAR(o_orderdate)                             AS yr,
               MONTH(o_orderdate)                            AS mo,
               DATE_TRUNC('month', o_orderdate)::TIMESTAMP   AS month_start,
               DATEDIFF('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
               ROUND(o_totalprice, 0)                        AS price_round,
               ABS(o_totalprice - 100000.0)                  AS price_dist_100k,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000  THEN 'mid'
                    ELSE 'small' END                         AS price_band
        FROM orders
    """,
}

QUERIES = {
    "filter_project": filter_project,
    "agg_groupby": agg_groupby,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "join_broadcast": join_broadcast,
    "join_shuffle": join_shuffle,
    "join_semi_anti": join_semi_anti,
    "join_outer": join_outer,
    "window_rank": window_rank,
    "window_running": window_running,
    "sort_limit_topk": sort_limit_topk,
    "set_ops": set_ops,
    "scalar_funcs": scalar_funcs,
}
