"""The object-storage commit seam (r14, VERDICT r13 item 2).

The reference's own data plane is GCS
(``/root/reference/mapreduce/coordinator/utils.py:35-39``), where no
atomic DIRECTORY rename exists. The engine's publication protocol
therefore has two modes, recorded per-index in the manifest:

* ``rename`` (POSIX fast path) — per-batch delta publishes commit via
  one atomic same-FS directory rename;
* ``marker`` — delta files are placed at their final names first and
  the batch's ``_filelist.json`` sidecar is written LAST with one
  atomic single-object write (the commit); readers treat a
  sidecar-less delta dir as uncommitted.

Version swaps need NO directory rename in EITHER mode since r14: a
resize/rebuild RESERVES its target version in the manifest under the
index lock, writes directly at the final versioned name, and commits
with the manifest flip — the marker-file pattern that translates to
object storage unchanged.

The shim here FORBIDS directory renames process-wide (Python side) —
os.rename / os.replace / shutil.move raise on directories — and the
whole transactional surface (ingest publish incl. both similarity
deltas, maintenance folds, an ANN resize, an IVF rebuild) must run
green under it. File renames stay allowed: a single-file rename
models the atomic single-object PUT/replace every object store has
(and Spark's own JVM-side task-commit renames are out of scope — a
cloud deployment replaces those with a cloud committer, not with this
protocol layer).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.ann_index import (
    build_ann_index,
    fold_ann_deltas,
    probe_ann_index,
    read_ann_manifest,
    resize_ann_index,
)
from irio2024_mapreduce_spark.operators.ann_index import (
    _deltas_root as _ann_droot,
)
from irio2024_mapreduce_spark.operators.ivf_index import (
    build_ivf_index,
    fold_ivf_deltas,
    probe_ivf_index,
    read_ivf_manifest,
    rebuild_ivf_index,
)
from irio2024_mapreduce_spark.operators.similarity import EMB_DIM
from irio2024_mapreduce_spark.plans.ingest import (
    build_corpus_index,
    ingest_batch,
)
from irio2024_mapreduce_spark.sources.sinks import FILELIST_NAME


def _vec(seed: int) -> list[float]:
    rng = random.Random(seed)
    return [rng.uniform(-1.0, 1.0) for _ in range(EMB_DIM)]


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t or "")) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def _emb(spark, ids):
    return spark.createDataFrame(
        [(int(i), _vec(i)) for i in ids],
        "vec_id long, v array<double>",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def no_dir_renames(monkeypatch):
    """Forbid DIRECTORY renames process-wide (Python side). File
    renames model the atomic single-object replace object stores
    provide and stay allowed."""
    import shutil

    real_rename, real_replace = os.rename, os.replace
    real_move = shutil.move

    def _guard(real):
        def inner(src, dst, *a, **kw):
            if os.path.isdir(src) and not os.path.islink(src):
                raise AssertionError(
                    f"directory rename forbidden by shim: {src} -> {dst}"
                )
            return real(src, dst, *a, **kw)

        return inner

    monkeypatch.setattr(os, "rename", _guard(real_rename))
    monkeypatch.setattr(os, "replace", _guard(real_replace))
    monkeypatch.setattr(shutil, "move", _guard(real_move))
    return None


SEED_DOCS = [
    (100, "the ancient library kept thousands of scrolls catalogued "
          "by patient scribes over centuries"),
    (101, "the fishing village woke before dawn as boats slipped "
          "quietly into the grey harbor water"),
]
BATCH_DOCS = [
    (200, "the mountain trail crossed seven wooden bridges before "
          "reaching the snowy summit ridge"),
    (202, "the night train rattled past sleeping towns carrying mail "
          "and quiet travellers north"),
]


@pytest.mark.slow  # r15: chaos/soak class, off the default gate path
def test_full_ingest_lifecycle_without_dir_renames(
    spark, tmp_path, monkeypatch, no_dir_renames
):
    """Ingest publish + BOTH similarity delta publishes + folds + an
    ANN resize + an IVF rebuild, all with directory renames forbidden
    — the object-storage discipline end-to-end. Marker mode is set at
    build time and recorded in the manifests."""
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_MODE", "marker")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "corpus")
    ann = str(tmp_path / "ann")
    ivf = str(tmp_path / "ivf")
    seed_ids = [i for i, _ in SEED_DOCS]
    build_corpus_index(spark, _frame(spark, SEED_DOCS), idx)
    build_ann_index(spark, _emb(spark, seed_ids), ann, bits=8)
    build_ivf_index(spark, _emb(spark, seed_ids), ivf, k_cells=2)
    assert read_ann_manifest(ann)["commit_mode"] == "marker"
    assert read_ivf_manifest(ivf)["commit_mode"] == "marker"

    m = ingest_batch(
        spark, _frame(spark, BATCH_DOCS), idx, out,
        batch_id=5, stream="s",
        batch_emb=_emb(spark, [i for i, _ in BATCH_DOCS]),
        ann_index_dir=ann, ivf_index_dir=ivf,
    )
    assert m["appended"] == 2

    am = read_ann_manifest(ann)
    droot = _ann_droot(ann, am["data"])
    batches = [d for d in os.listdir(droot) if d.startswith("b=")]
    assert len(batches) == 1
    # the batch dir carries its commit marker (sidecar written last)
    assert os.path.exists(
        os.path.join(droot, batches[0], FILELIST_NAME)
    )

    queries = _emb(spark, [200])
    top = (
        probe_ann_index(spark, queries, ann)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert top and top[0]["neighbor_id"] == 200
    itop = (
        probe_ivf_index(spark, queries, ivf)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert itop and itop[0]["neighbor_id"] == 200

    want_ann = _rows(probe_ann_index(spark, queries, ann))
    want_ivf = _rows(probe_ivf_index(spark, queries, ivf))

    # maintenance folds under the shim
    assert fold_ann_deltas(spark, ann)["batches"] == 1
    assert fold_ivf_deltas(spark, ivf)["batches"] == 1
    assert _rows(probe_ann_index(spark, queries, ann)) == want_ann
    assert _rows(probe_ivf_index(spark, queries, ivf)) == want_ivf

    # version swaps under the shim: reservation + direct final-name
    # write + manifest flip (no dir rename in any mode). A resize /
    # rebuild legitimately changes probe geometry (bits / centroids),
    # so the invariant is corpus preservation — every vector stays
    # probe-visible as its own rank-1 exact match — not result-set
    # equality with the pre-swap capture.
    out_r = resize_ann_index(spark, ann)
    assert out_r["rows"] == 4
    assert read_ann_manifest(ann)["data_version"] >= 2 or not out_r.get(
        "resized"
    )
    reb = rebuild_ivf_index(spark, ivf, force=True)
    assert reb["rebuilt"]
    all_ids = seed_ids + [i for i, _ in BATCH_DOCS]
    all_q = _emb(spark, all_ids)
    for probe, idx_dir in (
        (probe_ann_index, ann),
        (probe_ivf_index, ivf),
    ):
        top1 = {
            r["query_id"]: r["neighbor_id"]
            for r in probe(spark, all_q, idx_dir)
            .filter(F.col("rank") == 1)
            .collect()
        }
        assert top1 == {i: i for i in all_ids}


def test_marker_publish_is_invisible_until_sidecar(
    spark, tmp_path, monkeypatch, no_dir_renames
):
    """Batch-atomic visibility in marker mode: data files placed
    before the sidecar are invisible to probes AND folds; the sidecar
    write flips the whole batch visible at once; roll-forward of a
    crashed publish is idempotent."""
    import irio2024_mapreduce_spark.sources.sinks as sinks_mod
    from irio2024_mapreduce_spark.operators.ann_index import (
        delta_shaped_rows,
    )
    from irio2024_mapreduce_spark.operators.ann_index import (
        _delta_files as _ann_delta_files,
    )
    from irio2024_mapreduce_spark.sources.sinks import (
        publish_delta_marker,
        write_filelist,
    )

    monkeypatch.setenv("SPARK_GRAFT_COMMIT_MODE", "marker")
    ann = str(tmp_path / "ann")
    build_ann_index(spark, _emb(spark, [100, 101]), ann, bits=8)
    m = read_ann_manifest(ann)
    want = _rows(probe_ann_index(spark, _emb(spark, [300]), ann))

    staged = str(tmp_path / "staged_delta")
    delta_shaped_rows(
        _emb(spark, [300]), m["bits"], nparts=1,
        part_bits=m["part_bits"],
    ).write.mode("overwrite").partitionBy("tbl").parquet(staged)
    write_filelist(spark, staged)
    droot = _ann_droot(ann, m["data"])
    target = os.path.join(droot, "b=crash.1")

    # crash BEFORE the marker: files placed, sidecar never written
    real_awf = sinks_mod.atomic_write_file

    def crash_on_marker(path, content):
        if os.path.basename(path) == FILELIST_NAME:
            raise RuntimeError("injected crash before commit marker")
        return real_awf(path, content)

    monkeypatch.setattr(sinks_mod, "atomic_write_file", crash_on_marker)
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_delta_marker(staged, target)
    monkeypatch.setattr(sinks_mod, "atomic_write_file", real_awf)

    # uncommitted: probes and the fold's committed-file set skip it
    assert os.path.isdir(target)  # files ARE there...
    assert not os.path.exists(os.path.join(target, FILELIST_NAME))
    assert (
        _rows(probe_ann_index(spark, _emb(spark, [300]), ann)) == want
    )
    assert not _ann_delta_files(ann, m["data"], mode="marker")

    # roll-forward: idempotent re-copy + marker = the commit
    publish_delta_marker(staged, target)
    assert os.path.exists(os.path.join(target, FILELIST_NAME))
    after = _rows(probe_ann_index(spark, _emb(spark, [300]), ann))
    assert after != want  # vector 300 is now probe-visible
    top = (
        probe_ann_index(spark, _emb(spark, [300]), ann)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert top and top[0]["neighbor_id"] == 300
    # publishing again is a no-op (already committed)
    publish_delta_marker(staged, target)
    assert _rows(probe_ann_index(spark, _emb(spark, [300]), ann)) == after


def test_rename_mode_unchanged_by_default(spark, tmp_path):
    """The POSIX fast path stays the default: a build without the env
    records rename mode and publishes deltas via one dir rename."""
    ann = str(tmp_path / "ann")
    build_ann_index(spark, _emb(spark, [100, 101]), ann, bits=8)
    assert read_ann_manifest(ann)["commit_mode"] == "rename"
