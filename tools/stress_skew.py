"""Skewed-key probe for the salting helper vs Spark's built-ins.

Builds an events variant at N× (default 30×, ~3M rows) where ONE user
holds 10% of all rows (the classic hot-key shape: a bot account, a
NULL-ish default id), then measures group-by-user aggregation direct
vs through the two-phase salted pattern (`functions/skew.py`).

Two aggregate classes, because they stress the shuffle differently:

* ``sum(value)`` — associative; Spark's map-side PARTIAL aggregation
  collapses the hot key to one row per map task BEFORE the shuffle,
  so row-level skew never reaches a reducer. Expected: salting is
  pure overhead here (an extra shuffle), and the numbers should show
  it — the guidance is "don't salt associative aggregates".
* ``count(DISTINCT props)`` — partial aggregation can only dedupe
  per-partition; every surviving (hot_key, value) pair still shuffles
  to ONE reducer. Salting on hash(value) splits the hot key's
  distinct-set across `buckets` reducers and merges counts (disjoint
  value partitions ⇒ exact). Expected: salting wins as the distinct
  set grows; this is the case the manual lever exists for.

AQE note: AQE's skew handling (`OptimizeSkewedJoin`) applies to JOIN
shuffle partitions, not aggregation state — there is no automatic
rescue for a skewed high-cardinality distinct aggregate, which is why
the manual pattern matters. Results parity (direct == salted) is
asserted in-probe, not just timed.

* ``applyInPandas`` per-key op — the THIRD class, and the one with no
  Catalyst rescue at all: a group-map UDF has no partial phase, so
  the hot key's entire row set is shipped to ONE task and handed to
  Python as one group. Salting on a row-hash splits the hot group
  into `buckets` independent tasks whose partial results a tiny
  second-stage JVM agg combines. This is where the manual lever is
  load-bearing (measured below); every built-in aggregate beats both.

Usage: python tools/stress_skew.py [N] [hot_share]   (default 30 0.10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.functions.skew import (
    salted_agg_sum,
    skew_aware_group_apply,
)
from irio2024_mapreduce_spark.session import drain_driver_backlog, get_spark
from irio2024_mapreduce_spark.sources.tables import load_table

BUCKETS = 16


def build_skewed_events(spark, base: str, n: int, hot_share: float) -> str:
    """N× events where `hot_share` of all rows collapse onto user 1,
    and every row carries a near-unique payload string (so the
    distinct aggregate actually has distinct work per row)."""
    stage = tempfile.mkdtemp(prefix="stress_skew_")
    ev = load_table(spark, base, "events").select(
        "event_id", "user_id", "value"
    )
    scaled = None
    for k in range(n):
        part = ev.select(
            (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(k * 100_000_000)).alias("user_id"),
            "value",
        )
        scaled = part if scaled is None else scaled.unionByName(part)
    skewed = scaled.select(
        "event_id",
        # hot key: a deterministic hot_share slice of ALL rows becomes
        # user 1; everyone else keeps their (shifted) id
        F.when(
            F.pmod(F.xxhash64("event_id"), 1000) < int(hot_share * 1000), 1
        )
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "value",
        # near-unique per-row payload → the distinct agg can't collapse
        F.concat(F.lit("p"), F.col("event_id")).alias("props"),
    )
    skewed.repartition(32).write.mode("overwrite").parquet(
        os.path.join(stage, "events.parquet")
    )
    return stage


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def join_skew_probe() -> None:
    """Skewed SHUFFLE-JOIN A/B (VERDICT r5 item 4's unmeasured tail):
    events with a hot user joined to a per-user dim too big to
    broadcast, under three treatments —

      1. sort-merge join, AQE skew-join DISABLED: the hot user's
         entire row set lands in ONE join task (the straggler).
      2. sort-merge join, AQE skew-join ENABLED with thresholds
         scaled to this rig (the stock 256 MiB skewedPartitionThreshold
         never fires on a probe-sized shuffle; production keeps the
         defaults): OptimizeSkewedJoin splits the oversized partition
         into parallel sub-joins, replicating the matching dim rows.
      3. manual salt-and-replicate: rows salt on pmod(xxhash64(row_id),
         B), the dim side explodes ×B, join key becomes (user_id,
         salt). What you write by hand on engines without AQE — and
         the baseline that shows what AQE gives you for free.

    Row-count parity across all three is asserted before timing.

    Usage: python tools/stress_skew.py --join [N] [hot_share]
    """
    argv = sys.argv[2:]
    n = int(argv[0]) if argv else 100
    hot_share = float(argv[1]) if len(argv) > 1 else 0.10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-skew-join")
    spark.sparkContext.setLogLevel("ERROR")
    stage = build_skewed_events(spark, base, n, hot_share)
    ev = spark.read.parquet(os.path.join(stage, "events.parquet"))
    # per-user dim with a fat payload so Spark never broadcasts it
    # (belt: autoBroadcastJoinThreshold=-1 below is the suspenders)
    dim_path = os.path.join(stage, "user_dim.parquet")
    (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(F.lit("profile_"), F.col("user_id")).alias("profile"),
            F.repeat(F.lit("x"), 64).alias("pad"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path)

    def direct():
        return (
            ev.join(dim, "user_id")
            .groupBy("profile")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
        )

    def salted():
        salt = F.pmod(F.xxhash64("event_id"), F.lit(BUCKETS))
        left = ev.withColumn("_salt", salt)
        right = dim.withColumn(
            "_salt", F.explode(F.expr(f"sequence(0, {BUCKETS - 1})"))
        ).withColumn("_salt", F.col("_salt").cast("long"))
        return (
            left.join(right, ["user_id", "_salt"])
            .groupBy("profile")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
        )

    def with_confs(confs: dict, fn):
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    NO_BCAST = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    SKEW_OFF = {
        **NO_BCAST,
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    SKEW_ON = {
        **NO_BCAST,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # rig-scaled trigger: the thresholds compare COMPRESSED map
        # output, and a hot partition of millions of identical
        # user_ids + doubles lz4-compresses ~50×, so the stock
        # 256 MiB threshold (and even 8 MiB) never fires at probe
        # scale — production keeps the defaults
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    }

    # parity before timing
    sig = lambda df: df.agg(  # noqa: E731
        F.count("*"), F.sum("cnt"), F.round(F.sum("sv"), 3)
    ).collect()[0]
    s_off = with_confs(SKEW_OFF, lambda: sig(direct()))
    s_on = with_confs(SKEW_ON, lambda: sig(direct()))
    s_salt = with_confs(SKEW_OFF, lambda: sig(salted()))
    assert tuple(s_off) == tuple(s_on) == tuple(s_salt), (
        s_off,
        s_on,
        s_salt,
    )

    # prove the treatment is real: the executed AQE plan under
    # SKEW_ON must contain a skew-split SMJ. (Inspect the SAME
    # QueryExecution the action ran — a .write goes through a cloned
    # execution, so this check collects the aggregate instead.)
    def _skew_fired():
        df = direct()
        df.collect()
        return "skew=true" in (
            df._jdf.queryExecution().executedPlan().toString()
        )

    assert with_confs(SKEW_ON, _skew_fired), (
        "AQE skew-join did not fire under SKEW_ON confs"
    )
    assert not with_confs(SKEW_OFF, _skew_fired)

    out = {}
    for name, confs, fn in [
        ("smj_skewjoin_off", SKEW_OFF, direct),
        ("smj_skewjoin_on", SKEW_ON, direct),
        ("manual_salt_replicate", SKEW_OFF, salted),
    ]:
        def run():
            drain_driver_backlog(spark)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        out[name] = with_confs(confs, run)

    print(
        json.dumps(
            {
                "mode": "join",
                "scale": n,
                "rows": ev.count(),
                "dim_rows": dim.count(),
                "hot_share": hot_share,
                "buckets": BUCKETS,
                "sec": out,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--join":
        join_skew_probe()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")
    stage = build_skewed_events(spark, base, n, hot_share)
    ev = spark.read.parquet(os.path.join(stage, "events.parquet"))

    sum_direct = ev.groupBy("user_id").agg(
        F.sum("value").alias("sum_value"), F.count("*").alias("cnt")
    )
    sum_salted = salted_agg_sum(
        ev, ["user_id"], "value", buckets=BUCKETS
    ).withColumnRenamed("sum_value", "sum_value")

    dist_direct = ev.groupBy("user_id").agg(
        F.countDistinct("props").alias("n_distinct")
    )
    # salted distinct: hash(value) salting keeps equal values in the
    # same bucket, so per-bucket distinct counts add up exactly
    dist_salted = (
        ev.groupBy(
            "user_id", F.pmod(F.xxhash64("props"), BUCKETS).alias("_salt")
        )
        .agg(F.countDistinct("props").alias("_pd"))
        .groupBy("user_id")
        .agg(F.sum("_pd").alias("n_distinct"))
    )

    # parity first (cheap at the hot key): identical results or the
    # timing comparison is meaningless
    hot_direct = sum_direct.filter(F.col("user_id") == 1).collect()[0]
    hot_salted = sum_salted.filter(F.col("user_id") == 1).collect()[0]
    assert hot_direct["cnt"] == hot_salted["cnt"]
    assert abs(hot_direct["sum_value"] - hot_salted["sum_value"]) < 1e-6 * max(
        abs(hot_direct["sum_value"]), 1.0
    )
    hd = dist_direct.filter(F.col("user_id") == 1).collect()[0]["n_distinct"]
    hs = dist_salted.filter(F.col("user_id") == 1).collect()[0]["n_distinct"]
    assert hd == hs, (hd, hs)

    # applyInPandas per-key op: weighted percentile-ish stat that a
    # group-map UDF would be used for (needs the whole group in one
    # frame — not expressible as a built-in aggregate without rewrite)
    import pandas as pd

    def _gstat(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "v_sum": [float(pdf["value"].sum())],
            }
        )

    def _gstat_salted(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "_salt": [pdf["_salt"].iloc[0]],
                "n": [len(pdf)],
                "v_sum": [float(pdf["value"].sum())],
            }
        )

    pandas_direct = ev.groupBy("user_id").applyInPandas(
        _gstat, schema="user_id long, n long, v_sum double"
    )
    pandas_salted = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), BUCKETS))
        .groupBy("user_id", "_salt")
        .applyInPandas(
            _gstat_salted,
            schema="user_id long, _salt long, n long, v_sum double",
        )
        .groupBy("user_id")
        .agg(F.sum("n").alias("n"), F.sum("v_sum").alias("v_sum"))
    )
    # hot-key-only salting: the tail keeps direct's group topology,
    # only detected heavy hitters spread over `buckets` tasks
    pandas_hot = skew_aware_group_apply(
        ev.select("user_id", "value"),
        ["user_id"],
        _gstat,
        "user_id long, n long, v_sum double",
        {"n": F.sum("n"), "v_sum": F.sum("v_sum")},
        buckets=BUCKETS,
        hot_threshold=100_000,
    )

    pd_d = pandas_direct.filter(F.col("user_id") == 1).collect()[0]
    for alt in (pandas_salted, pandas_hot):
        pd_s = alt.filter(F.col("user_id") == 1).collect()[0]
        assert pd_d["n"] == pd_s["n"]
        assert abs(pd_d["v_sum"] - pd_s["v_sum"]) < 1e-6 * max(
            abs(pd_d["v_sum"]), 1.0
        )

    out = {}
    for name, df in [
        ("sum_direct", sum_direct),
        ("sum_salted", sum_salted),
        ("distinct_direct", dist_direct),
        ("distinct_salted", dist_salted),
        ("pandas_direct", pandas_direct),
        ("pandas_salted", pandas_salted),
        ("pandas_hot_salted", pandas_hot),
    ]:
        drain_driver_backlog(spark)
        df.write.mode("overwrite").format("noop").save()  # warm
        out[name] = timed(df)

    total = ev.count()
    print(
        json.dumps(
            {
                "scale": n,
                "rows": total,
                "hot_share": hot_share,
                "hot_rows": int(hot_direct["cnt"]),
                "buckets": BUCKETS,
                "sec": out,
            }
        )
    )


if __name__ == "__main__":
    main()
