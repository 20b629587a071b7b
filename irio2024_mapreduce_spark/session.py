"""SparkSession factory with configs pinned for this engine.

Replaces the reference's entire control plane (coordinator process,
Postgres job state, k8s DNS worker discovery — see SURVEY.md §3.1):
on Spark, a session *is* the engine. Configs are chosen for
scale-out correctness first, local[32] testing second:

* AQE on — runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace the reference's
  "expected_parts = live workers" elasticity
  (reference ``mapreduce/coordinator/update_loop.py:88-89``).
* UTC session timezone — the events table is timestamp-typed; window
  boundaries must agree with the DuckDB oracle.
* Arrow enabled — every pandas UDF / ``mapInPandas`` crossing is
  Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# r14 (guide §1.2 step 1 / §7.2 duplicated subtrees): explode() over a
# projected array column makes InferFiltersFromGenerate add a
# ``size(col) > 0`` filter, which PushDownPredicates then rewrites
# through the defining Project — re-substituting the FULL array-building
# expression (for the shingle/n-gram paths that is the interpreted
# higher-order transform, with split(text) inlined per element — the
# O(len²)-per-doc form) into a per-row Filter that runs BEFORE and IN
# ADDITION TO the projection itself. Every exploded array in this
# engine is non-empty by construction (``greatest(bound, 1)`` floors
# the sequence), so the inferred filter prunes zero rows: excluding
# the rule removes a full duplicate evaluation of the most expensive
# per-task expressions and cannot change results (explode drops
# empty/null arrays itself). Measured in OPTIMIZATION_r14.md.
EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def ensure_session_confs(spark: SparkSession, force: bool = False) -> None:
    """Pin the runtime-settable confs correctness depends on, on an
    EXISTING session (the grading driver builds its own session, which
    won't have gone through :func:`get_spark`):

    * ``nanosAsLong`` — events.ts is parquet TIMESTAMP(NANOS); without
      this every read of the events table throws PARQUET_TYPE_ILLEGAL.
    * UTC session timezone — window boundaries / date parts must agree
      with the DuckDB oracle regardless of host timezone.
    * ``InferFiltersFromGenerate`` excluded — see :data:`EXCLUDED_RULES`
      (perf, not correctness: results are identical with the rule on;
      runtime-settable, so pinning it here reaches sessions that never
      went through :func:`get_spark`).
    """
    # r14 opt: set once per SparkSession object — this runs on EVERY
    # load_table call (several per query build, 3 py4j round-trips
    # each), which profiling showed as measurable driver time across
    # a 32-query battery. The flag rides on the Python session object;
    # a second Python wrapper around the same JVM session just re-sets
    # the same values once (idempotent). Tools that deliberately
    # mutate these confs mid-session (tools/ab_r14_batch1.py) restore
    # them themselves — or call this with ``force=True`` to re-pin
    # without reaching into the private flag (ADVICE r14).
    if not force and getattr(spark, "_irio_confs_ensured", False):
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_RULES)
    try:
        spark._irio_confs_ensured = True
    except AttributeError:  # exotic session wrapper with __slots__
        pass


def drain_driver_backlog(spark: SparkSession | None = None) -> None:
    """Session hygiene for long-lived PySpark drivers running many
    distinct queries: force a Python GC so the py4j JavaObject
    reference backlog (every Column/DataFrame handle a plan build
    creates) detaches NOW, between queries, instead of when Python's
    generational GC happens to fire MID-build — at which point the
    detach RPCs serialize on the same py4j gateway connection the
    build needs and wall time inflates 3-30× with no JVM-side
    signature (root-caused in SCALE.md round-5; measured stats_pack
    50-78 s vs 1.6-3.1 s at sf0.001). Call between queries in any
    multi-query driver loop (bench.py and tools/check_oracle.py do).

    Pass ``spark`` to ALSO trigger a JVM collection: detaching the
    Python refs makes the JVM-side RDD/broadcast handles garbage, but
    the ContextCleaner only unpersists their block-manager entries
    when the JVM actually collects — and a mostly-idle multi-GiB
    driver heap can go a long time between collections, so repeated
    checkpoint-heavy queries accumulate dead blocks and degrade
    (measured: iterative dedup_clusters runs swinging 8-64 s
    uncontrolled vs settling at 5.5-5.9 s with the JVM nudge;
    persistent-RDD count held flat instead of growing). Driver-side
    only; executor JVMs are unaffected.
    """
    import gc
    import time

    gc.collect()
    if spark is not None:
        spark.sparkContext._jvm.System.gc()
        # ContextCleaner processes the newly-enqueued dead references
        # on its OWN thread — give it a beat so the unpersist/remove
        # RPC burst lands HERE, not inside the caller's next timed
        # window (measured: without the pause, a bench battery's tail
        # queries inflated ~1.5-2× from cleaner work running
        # concurrently with them)
        time.sleep(0.3)


def get_spark(
    app_name: str = "irio2024-mapreduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the caller passes no ``master`` and
    spark-submit supplies it; locally we default to ``local[N]``
    with N = ``$SPARK_GRAFT_CPUS`` or all cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    # config-independence hook: results must not depend on AQE (the
    # oracle sweep re-runs with it off — tools/sweep_configs.py)
    aqe = "false" if os.environ.get("SPARK_GRAFT_AQE") == "0" else "true"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Files: at 100 TB the default 128 MiB split keeps ~800k tasks for
        # the full scan — fine; don't shrink it. Open cost keeps many tiny
        # files from over-splitting.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in the source (tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NB: only engages on the DataSource V2 parquet path — Spark
        # defaults parquet to V1 (spark.sql.sources.useV1SourceList),
        # where this conf is inert. Kept on so deployments that flip
        # to V2 get footer-statistics COUNT/MIN/MAX for free; the V2
        # behavior is pinned by tests/test_plans.py.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        # local-mode: driver heap IS the executor heap for all threads;
        # size it so GC pauses don't dominate multi-query batteries
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        # Long-lived-session hygiene: ContextCleaner only reclaims
        # shuffle files / broadcast blocks / checkpointed RDDs when the
        # JVM garbage-collects their driver-side handles — and a large,
        # mostly-idle heap (24 GiB here, bigger in production) can go
        # HOURS between collections, so a many-query session leaks disk
        # and block-manager entries the whole time. A 15-minute forced
        # GC bounds that window; the default is 30 min.
        .config("spark.cleaner.periodicGC.interval", "15min")
    )
    # Production state-store: RocksDB keeps streaming state (open
    # sessions, window partials) off-heap and spillable — the default
    # HDFS-backed provider holds every key in executor heap, which at
    # 100 TB / millions of open sessions is an OOM. Off by default
    # locally (tests run both providers the same way); flip on with
    # SPARK_GRAFT_ROCKSDB_STATE=1.
    if os.environ.get("SPARK_GRAFT_ROCKSDB_STATE") == "1":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
