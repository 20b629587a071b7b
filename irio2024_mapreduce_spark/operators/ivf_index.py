"""Stored IVF index — the production story ``similarity_ivf``'s
docstring promises ("written at ingest partitioned by cell") as a
first-class artifact, sharing the graded query's exact training and
scoring code (``_ivf_centroids`` / ``_nearest_cell`` / ``_query_cells``
/ ``_ivf_score``), so stored-probe answers are on-the-fly answers by
construction, not by re-implementation.

Layout and commit discipline (the ANN index's pointer shape):

* ``{index_dir}/_ivf_manifest.json`` — k_cells, dim, version pointers
  to the live data dirs; validated on every open;
* ``{index_dir}/centroids_v{N}/`` — the trained coarse quantizer
  (cell, cv), tiny (k rows), broadcast by every probe;
* ``{index_dir}/cells_v{N}/cell=*/`` — corpus rows partitioned by
  their assigned cell: a probe is a path list of nprobe dirs per
  query. With ``quantize=True`` rows store int8 codes + a per-vector
  scale (symmetric quantization, ``quant_code_col``'s bit-exact
  expression) — 1 byte/dim instead of 8 — and the probe dequantizes
  on read.

A rebuild (re-train at the corpus's grown size) writes version N+1
completely, then commits with one atomic manifest replace and GCs the
old version — readers never see a half-built index. Appends assign
new vectors to the EXISTING centroids (map-only, the daily path);
``rebuild_ivf_index`` is the maintenance pass that re-trains when the
corpus has outgrown k ≈ √n.

Scale shape: training cost is CONSTANT (bounded sample → driver-side
Lloyd), the corpus pays one map-only assignment pass per build/append,
and a probe touches nprobe/k of the corpus — the fraction SHRINKS as
the corpus (and therefore k) grows. ``tools/stress_ivf_index.py``
measures probe cost and the touched fraction at 1× and 100×.
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.similarity import (
    EMB_DIM,
    IVF_CENTROIDS,
    IVF_NPROBE,
    IVF_TRAIN_MAX,
    QUANT_LEVELS,
    _is_finite_vector,
    _ivf_centroids,
    _ivf_score,
    _nearest_cell,
    _query_cells,
    quant_abs_max,
    quant_code_col,
)
from irio2024_mapreduce_spark.sources.sinks import (
    acquire_compaction_lock,
    acquire_compaction_lock_patiently,
    atomic_write_file,
    release_compaction_lock,
)

IVF_INDEX_MANIFEST = "_ivf_manifest.json"
IVF_INDEX_VERSION = 1
# cells are capped so the bounded training sample keeps at least a
# few points per centroid (k-means quality saturates there — the
# IVF_TRAIN_MAX rationale), and floored at the graded query's k
MAX_CELLS = IVF_TRAIN_MAX // 4


def target_cells(rows: int) -> int:
    """The standard IVF sizing rule k ≈ √rows, clamped to
    [IVF_CENTROIDS, MAX_CELLS]. nprobe/k — the corpus fraction a
    probe scans — shrinks as the corpus grows."""
    if rows <= 0:
        return IVF_CENTROIDS
    return max(IVF_CENTROIDS, min(MAX_CELLS, round(math.sqrt(rows))))


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, IVF_INDEX_MANIFEST)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest replace — THE commit point of build/rebuild
    (the shared sinks.atomic_write_file shape)."""
    atomic_write_file(
        _manifest_path(index_dir), json.dumps(manifest, indent=1)
    )


def read_ivf_manifest(index_dir: str) -> dict:
    """Load and validate the stored manifest against the engine's
    current constants."""
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        raise ValueError(
            f"{index_dir} has no {IVF_INDEX_MANIFEST}: not an IVF "
            "index built by build_ivf_index"
        )
    with open(path) as f:
        m = json.load(f)
    expected = {"version": IVF_INDEX_VERSION, "dim": EMB_DIM}
    mismatches = {
        k: (m.get(k), v) for k, v in expected.items() if m.get(k) != v
    }
    if mismatches:
        detail = ", ".join(
            f"{k}: index has {a!r}, engine expects {b!r}"
            for k, (a, b) in sorted(mismatches.items())
        )
        raise ValueError(
            f"IVF index at {index_dir} does not match this engine "
            f"({detail}) — rebuild it with the current constants"
        )
    return m


def _gc_orphan_versions(index_dir: str, live: int) -> int:
    """Remove cells_v*/centroids_v* dirs other than the live version —
    crashed-rebuild leftovers and superseded versions."""
    removed = 0
    for d in os.listdir(index_dir):
        p = os.path.join(index_dir, d)
        for prefix in ("cells_v", "centroids_v"):
            if (
                d.startswith(prefix)
                and d[len(prefix):].isdigit()
                and int(d[len(prefix):]) != live
                and os.path.isdir(p)
            ):
                shutil.rmtree(p)
                removed += 1
    return removed


def _stored_rows(assigned: DataFrame, quantize: bool) -> DataFrame:
    """The cell-partitioned storage frame. Quantized rows keep the
    bit-exact int8 code expression (quant_code_col) + per-vector
    scale; non-finite vectors are excluded by the established
    cross-engine contract."""
    if not quantize:
        return assigned.select("vec_id", "v", "cell")
    with_m = assigned.filter(_is_finite_vector(F.col("v"))).withColumn(
        "_m", quant_abs_max(F.col("v"))
    )
    return with_m.select(
        "vec_id",
        (F.col("_m") / QUANT_LEVELS).alias("scale"),
        quant_code_col(F.col("v"), F.col("_m"), "tinyint").alias("codes"),
        "cell",
    )


def _write_version(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n: int,
    k: int,
    quantize: bool,
) -> DataFrame:
    """Train + assign + write version ``n``'s dirs. Returns the
    centroid frame (for callers that keep probing)."""
    centroids = _ivf_centroids(spark, emb, k)
    centroids.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, f"centroids_v{n}")
    )
    assigned = _nearest_cell(emb, centroids)
    _stored_rows(assigned, quantize).repartition("cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(index_dir, f"cells_v{n}"))
    return centroids


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    k_cells: int | None = None,
    quantize: bool = False,
) -> dict:
    """Build the stored index over ``emb`` (``vec_id``,
    ``v: array<double>``): constant-cost training, ONE map-only
    assignment pass, cell-partitioned write, atomic manifest commit.
    Returns the manifest."""
    rows = emb.count()
    k = k_cells or target_cells(rows)
    os.makedirs(index_dir, exist_ok=True)
    lock = acquire_compaction_lock(index_dir)
    try:
        prior = 0
        if os.path.exists(_manifest_path(index_dir)):
            # raw read, NOT read_ivf_manifest: a full build exists to
            # replace an index — including one whose dim/constants no
            # longer validate, which is exactly when the operator is
            # told to 'rebuild with the current constants'
            with open(_manifest_path(index_dir)) as f:
                prior = int(json.load(f).get("data_version", 0))
        n = prior + 1
        _write_version(spark, emb, index_dir, n, k, quantize)
        manifest = {
            "version": IVF_INDEX_VERSION,
            "family": "ivf-cosine",
            "dim": EMB_DIM,
            "k_cells": k,
            "rows": rows,
            "quantized": quantize,
            "data_version": n,
        }
        _write_manifest(index_dir, manifest)  # the commit point
        _gc_orphan_versions(index_dir, n)
        return manifest
    finally:
        release_compaction_lock(lock)


def append_ivf_index(
    spark: SparkSession, emb: DataFrame, index_dir: str
) -> int:
    """Append new vectors at the STORED centroids (daily path —
    map-only assignment, no re-train). HOLDS the maintenance flock for
    the whole append: a check-then-write would let a rebuild that
    starts mid-append GC the cells version the append targets and
    have the closing manifest write revert ``data_version`` to the
    deleted dir."""
    lock = acquire_compaction_lock_patiently(index_dir)
    try:
        m = read_ivf_manifest(index_dir)
        n = m["data_version"]
        centroids = spark.read.parquet(
            os.path.join(index_dir, f"centroids_v{n}")
        )
        assigned = _nearest_cell(emb, centroids)
        _stored_rows(assigned, m["quantized"]).repartition(
            "cell"
        ).write.mode("append").partitionBy("cell").parquet(
            os.path.join(index_dir, f"cells_v{n}")
        )
        added = emb.count()
        _write_manifest(index_dir, {**m, "rows": m["rows"] + added})
        return added
    finally:
        release_compaction_lock(lock)


def rebuild_ivf_index(
    spark: SparkSession, index_dir: str, k_cells: int | None = None
) -> dict:
    """Maintenance: recount the stored corpus, re-train at
    k ≈ √rows, and rewrite as version N+1 with one atomic manifest
    flip (readers never blocked). Quantized indexes re-train on the
    dequantized vectors — the centroids move by at most the
    quantization error, which the sizing rule dwarfs."""
    lock = acquire_compaction_lock(index_dir)
    try:
        m = read_ivf_manifest(index_dir)
        _gc_orphan_versions(index_dir, m["data_version"])
        vecs = _read_vectors(
            spark, index_dir, m
        ).dropDuplicates(["vec_id"]).localCheckpoint(eager=True)
        rows = vecs.count()
        k = k_cells or target_cells(rows)
        if k == m["k_cells"]:
            _write_manifest(index_dir, {**m, "rows": rows})
            return {"k_cells": k, "rebuilt": False, "rows": rows}
        n = m["data_version"] + 1
        _write_version(spark, vecs, index_dir, n, k, m["quantized"])
        _write_manifest(
            index_dir,
            {**m, "k_cells": k, "rows": rows, "data_version": n},
        )  # the commit point
        _gc_orphan_versions(index_dir, n)
        return {
            "k_before": m["k_cells"],
            "k_cells": k,
            "rebuilt": True,
            "rows": rows,
        }
    finally:
        release_compaction_lock(lock)


def _read_vectors(
    spark: SparkSession, index_dir: str, m: dict
) -> DataFrame:
    """(vec_id, v) from the live cells dirs, dequantizing if needed."""
    df = spark.read.parquet(
        os.path.join(index_dir, f"cells_v{m['data_version']}")
    )
    if m["quantized"]:
        return df.select(
            "vec_id", _dequant(F.col("codes"), F.col("scale")).alias("v")
        )
    return df.select("vec_id", "v")


def _dequant(codes, scale):
    return F.transform(codes, lambda c: c.cast("double") * scale)


def probe_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Answer ``queries`` (``vec_id``, ``v``) from the stored index:
    broadcast the centroids, pick each query's nprobe closest cells,
    point-read exactly those cell dirs, score with the shared
    join+cosine+top-k. Unprobed cells are never opened."""
    m = read_ivf_manifest(index_dir)
    n = m["data_version"]
    centroids = spark.read.parquet(
        os.path.join(index_dir, f"centroids_v{n}")
    )
    q_cells = _query_cells(queries, centroids, nprobe).localCheckpoint(
        eager=True
    )
    cells = sorted(
        {r["cell"] for r in q_cells.select("cell").distinct().collect()}
    )
    data_dir = os.path.join(index_dir, f"cells_v{n}")
    paths = [
        os.path.join(data_dir, f"cell={c}")
        for c in cells
        if os.path.isdir(os.path.join(data_dir, f"cell={c}"))
    ]
    if not paths:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank long"
        )
    # keep-one on vec_id: a crash-replayed ingest roll-forward can
    # re-append rows (at-least-once in its rare re-shape path); the
    # dedup runs on the PROBED subset only — bounded row mass — and
    # is a no-op hash-agg when no duplicates exist
    stored = (
        spark.read.option("basePath", data_dir)
        .parquet(*paths)
        .dropDuplicates(["vec_id"])
    )
    if m["quantized"]:
        stored = stored.select(
            "vec_id",
            _dequant(F.col("codes"), F.col("scale")).alias("v"),
            F.col("cell").cast("int").alias("cell"),
        )
    else:
        stored = stored.select(
            "vec_id", "v", F.col("cell").cast("int").alias("cell")
        )
    return _ivf_score(stored, q_cells)
