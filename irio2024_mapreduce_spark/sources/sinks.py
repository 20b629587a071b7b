"""Sinks — reference R9 parity plus the partitioned writers a real
deployment uses.

The reference's only sink concatenates reduce outputs into ONE blob
(``mapreduce/coordinator/algorithm.py:117-139``). On Spark that is a
plan shape — ``coalesce(1)`` feeding a single write task. We keep it
for parity and small results, but the scale path is
:func:`write_partitioned`: parallel tasks, optional partition columns
for downstream pruning, optional bucketing so future joins on the
bucket keys skip their shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_single_file(
    df: DataFrame, path: str, fmt: str = "csv", header: bool = True
) -> None:
    """Reference R9: one output file. ``coalesce(1)`` (NOT
    ``repartition(1)``) — it narrows the last stage without forcing an
    extra shuffle. Only sane for driver-scale results (the reference
    had the same constraint: its collect step streamed every reduce
    output through the coordinator)."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", str(header).lower())
    writer.format(fmt).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """The 100 TB sink: one file per task, hive-style partition dirs
    so downstream readers get partition pruning for free."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed table: joins/aggregations on ``bucket_cols`` skip
    their shuffle (co-located partitioning persisted at write time) —
    the answer to 'orders ⋈ lineitem shuffles 100 TB'. The
    shuffle-free join plan is asserted in tests/test_bucketed_join.py.

    ``path`` makes the table external (data at ``path`` instead of the
    session warehouse — ``spark.sql.warehouse.dir`` is static config
    and can't be set on a live session)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction for an append-grown parquet dataset —
    the maintenance pass an ingest pipeline (``plans.ingest``
    appends one batch-sized file set per day) schedules periodically.

    A dataset of f tiny files costs every future reader f opens and
    f-task scheduling; at 100 TB a year of daily appends is >300
    file sets per partition. Compaction rewrites the dataset into
    ceil(bytes / target_file_bytes) files of ~``target_file_bytes``
    (the same 128 MiB the scan-side ``maxPartitionBytes`` is tuned
    to, so post-compaction one file ≈ one split ≈ one task).

    Swap semantics on a plain filesystem: write to a sibling temp
    dir, then TWO renames (path→old, tmp→path). Each rename is
    atomic but the pair is not — a reader in the gap sees a missing
    dataset, and a crash between them leaves the data under
    ``._compact_old``. Both are recovered here: stale temp dirs are
    cleaned on entry and an orphaned old dir (crash signature: old
    exists, path missing) is renamed back before compacting. True
    readers-never-blocked atomicity needs a manifest/metastore
    pointer flip (transactional table format) — this is the honest
    filesystem approximation, not that. Returns
    {files_before, files_after, bytes}.

    Hive-partitioned datasets must pass ``partition_by`` (the rewrite
    then compacts WITHIN each partition dir); compacting one without
    it would silently flatten the layout and lose partition pruning
    for every downstream reader — refused loudly instead.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # crash recovery: a stale tmp is garbage from a failed write; a
    # stale old with NO live dataset is the pre-swap data — restore
    # it; a stale old WITH a live dataset is post-swap garbage.
    if _os.path.exists(tmp):
        _shutil.rmtree(tmp)
    if _os.path.exists(old):
        if _os.path.exists(path):
            _shutil.rmtree(old)
        else:
            _os.rename(old, path)

    hive_dirs = [
        d
        for d in _os.listdir(path)
        if "=" in d and _os.path.isdir(_os.path.join(path, d))
    ]
    if hive_dirs and not partition_by:
        raise ValueError(
            f"{path} is hive-partitioned ({hive_dirs[0]}, ...): pass "
            "partition_by= or the compaction would flatten the layout "
            "and lose partition pruning"
        )

    data_files = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*.parquet"),
                            recursive=True)
        if _os.path.isfile(f)
    ]
    files_before = len(data_files)
    total_bytes = sum(_os.path.getsize(f) for f in data_files)
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil

    # repartition (round-robin shuffle) — not coalesce: coalesce
    # narrows without rebalancing, so one fat input file would keep
    # its skew and produce one fat output file. Partitioned datasets
    # RANGE-partition on (partition cols, row hash): ranges keep a
    # partition's rows on contiguous tasks (each task writes into at
    # most a couple of hive dirs, so total files stay ~n_out) while
    # the trailing hash splits a HOT partition across as many tasks
    # as its bytes deserve — plain repartition(n_out, *partition_by)
    # would collapse each hive dir onto ONE task and write one
    # arbitrarily large file per partition, ignoring the byte target.
    df = spark.read.parquet(path)
    if partition_by:
        salt = F.xxhash64(*[F.col(c) for c in df.columns])
        shaped = df.repartitionByRange(
            n_out, *[F.col(c) for c in partition_by], salt
        )
        writer = shaped.write.mode("overwrite").partitionBy(*partition_by)
    else:
        writer = df.repartition(n_out).write.mode("overwrite")
    writer.parquet(tmp)
    _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old)

    files_after = len(
        [
            f
            for f in _glob.glob(
                _os.path.join(path, "**", "*.parquet"), recursive=True
            )
            if _os.path.isfile(f)
        ]
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
