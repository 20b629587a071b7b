"""JobRegistry (R13 parity), sinks (R9 parity), UDF helper tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.functions.udfs import zscore_by_group, zscore_scalar
from irio2024_mapreduce_spark.registry_jobs import JobRegistry, JobStatus
from irio2024_mapreduce_spark.sources.sinks import (
    write_partitioned,
    write_single_file,
)


def test_job_lifecycle(spark):
    reg = JobRegistry(spark)
    jid = reg.start_job(lambda s: s.range(10).toDF("x"))
    job = reg.job_status(jid)
    assert job.status is JobStatus.FINISHED and job.rows == 10
    assert reg.last_job_status().job_uuid == jid


def test_job_failure_recorded(spark):
    reg = JobRegistry(spark)
    jid = reg.start_job(lambda s: s.sql("select * from missing_table_xyz"))
    job = reg.job_status(jid)
    assert job.status is JobStatus.FAILED
    assert "missing_table_xyz" in (job.error or "")


def test_single_job_lock(spark):
    """Reference parity: one job at a time (database.py:53-55)."""
    import threading

    reg = JobRegistry(spark)
    gate = threading.Event()

    def slow(s):
        gate.wait(timeout=10)
        return s.range(1)

    reg.start_job(slow, block=False)
    with pytest.raises(RuntimeError, match="in progress"):
        reg.start_job(lambda s: s.range(1))
    gate.set()


def test_single_file_sink(spark, tmp_path):
    """R9: exactly one data file, concatenating all partitions."""
    df = spark.range(100).repartition(8).toDF("x")
    out = str(tmp_path / "single")
    write_single_file(df, out, fmt="csv")
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1
    lines = open(os.path.join(out, files[0])).read().strip().split("\n")
    assert len(lines) == 101  # header + 100 rows


def test_partitioned_sink_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["x", "part"]
    )
    out = str(tmp_path / "parts")
    write_partitioned(df, out, partition_by=["part"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("part=")
    ) == ["part=a", "part=b"]
    back = spark.read.parquet(out).filter(F.col("part") == "a")
    assert back.count() == 2


def test_zscore_scalar_udf(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["v"])
    rows = sorted(
        r["z"] for r in df.select(zscore_scalar()("v").alias("z")).collect()
    )
    assert abs(rows[1]) < 1e-9 and abs(rows[0] + rows[2]) < 1e-9


def test_zscore_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)], ["g", "v"]
    )
    out = zscore_by_group(df, "g", "v").collect()
    by_g: dict[str, list[float]] = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["z"])
    for zs in by_g.values():
        assert sorted(zs) == [-1.0, 1.0]
