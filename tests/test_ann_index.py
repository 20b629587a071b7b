"""Stored ANN index (r9 verdict item 2): build/append/probe/resize
with the H = log2(rows / bucket_target) sizing rule. The contract —
stored-probe answers are IDENTICAL to the on-the-fly path at the same
signature width, the manifest pins that width so a probe can never
sign queries wrong, and resize restores ~bucket_target rows per
bucket after the corpus outgrows the built width."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.ann_index import (
    BITS_MAX,
    BITS_MIN,
    append_ann_index,
    build_ann_index,
    probe_ann_index,
    read_ann_manifest,
    resize_ann_index,
    target_bits,
)
from irio2024_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    _ann_topk,
    _as_double,
)
from irio2024_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    return df.localCheckpoint(eager=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sizing_rule():
    assert target_bits(0) == BITS_MIN
    assert target_bits(64) == BITS_MIN  # 1 bucket's worth → clamp low
    assert target_bits(64 * 256) == 8  # log2(256)
    assert target_bits(64 * (1 << 16)) == 16
    assert target_bits(10**18) == BITS_MAX  # clamp high
    assert target_bits(64 * 1024, bucket_target=1024) == 6


def test_build_probe_parity_with_fly(spark, emb, tmp_path):
    """Stored probe == on-the-fly at the same bits, on the graded
    query's own data and id conventions."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    m = build_ann_index(spark, corpus, idx, bits=8)
    assert m["bits"] == 8 and m["data"] == "rows_h8_v1"
    stored = _rows(probe_ann_index(spark, queries, idx))
    fly = _rows(_ann_topk(emb, bits=8))
    assert stored == fly and len(stored) > 0


def test_manifest_guards_probe(spark, emb, tmp_path):
    idx = str(tmp_path / "ann")
    with pytest.raises(ValueError, match="no _ann_manifest"):
        read_ann_manifest(idx)
    build_ann_index(spark, emb.filter(F.col("vec_id") >= N_QUERIES), idx)
    # tamper: an index built by a different engine configuration
    path = os.path.join(idx, "_ann_manifest.json")
    m = json.load(open(path))
    m["tables"] = 99
    json.dump(m, open(path, "w"))
    with pytest.raises(ValueError, match="tables"):
        probe_ann_index(
            spark, emb.filter(F.col("vec_id") < N_QUERIES), idx
        )


def test_append_then_resize_restores_bucket_target(spark, emb, tmp_path):
    """The r9 measurement's scenario: an index built small, outgrown
    by appends, then resized — bits grow per the rule, answers stay
    parity with on-the-fly at the new width, and per-bucket
    population returns to ~bucket_target."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    n0 = corpus.count()

    # build deliberately narrow (4 bits) with a tiny bucket target so
    # the recount triggers a real resize on test-sized data
    build_ann_index(spark, corpus, idx, bits=4, bucket_target=8)

    # the corpus doubles via append (shifted ids — new vectors)
    extra = corpus.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    assert append_ann_index(spark, extra, idx) == n0
    assert read_ann_manifest(idx)["rows"] == 2 * n0

    out = resize_ann_index(spark, idx)
    assert out["resized"] and out["rows"] == 2 * n0
    assert out["bits"] == target_bits(2 * n0, 8)
    assert out["bits"] > 4
    m = read_ann_manifest(idx)
    assert m["bits"] == out["bits"]
    assert not os.path.isdir(os.path.join(idx, "rows_h4_v1"))

    # parity with on-the-fly over the SAME grown corpus at the new H
    grown = emb.filter(F.col("vec_id") < N_QUERIES).unionByName(
        corpus
    ).unionByName(extra)
    stored = _rows(probe_ann_index(spark, queries, idx))
    fly = _rows(_ann_topk(grown, bits=m["bits"]))
    assert stored == fly and len(stored) > 0

    # bucket population back near target: mean rows per (tbl, cb)
    data = spark.read.parquet(os.path.join(idx, m["data"]))
    n_buckets = data.select("tbl", "cb").distinct().count()
    mean_rows = data.count() / n_buckets
    assert mean_rows <= 8 * 4  # within a small factor of the target


def test_resize_is_noop_at_the_right_width(spark, emb, tmp_path):
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    build_ann_index(spark, corpus, idx)  # auto-sized
    m0 = read_ann_manifest(idx)
    out = resize_ann_index(spark, idx)
    assert not out["resized"] and out["bits"] == m0["bits"]


def test_rebuild_same_width_never_writes_into_live_dir(
    spark, emb, tmp_path
):
    """r10 advice (medium): a rebuild whose recomputed H equals the
    live index's bits must NOT overwrite the live data dir in place —
    the dir name is versioned, so the old dir survives until the new
    manifest flip, and lock-free probes never see a half-built index."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    m1 = build_ann_index(spark, corpus, idx, bits=8)
    assert m1["data"] == "rows_h8_v1" and m1["data_version"] == 1
    before = _rows(probe_ann_index(spark, queries, idx))

    m2 = build_ann_index(spark, corpus, idx, bits=8)
    assert m2["data"] == "rows_h8_v2" and m2["data_version"] == 2
    assert not os.path.isdir(os.path.join(idx, "rows_h8_v1"))  # GC'd
    assert _rows(probe_ann_index(spark, queries, idx)) == before


def test_same_width_resize_compacts_duplicate_appends(
    spark, emb, tmp_path
):
    """r10 advice (low): the docstring's 'doubles as dedup compaction'
    claim must hold even when H doesn't change — duplicate appended
    rows are physically collapsed, to a NEW versioned dir."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    n0 = corpus.count()
    # auto-sized, so the post-dedup recount (n0) re-derives the SAME H
    build_ann_index(spark, corpus, idx)
    before = _rows(probe_ann_index(spark, queries, idx))

    # redeliver the whole corpus: same vec_ids → pure duplicates, so
    # the recomputed H is unchanged but physical rows doubled
    append_ann_index(spark, corpus, idx)
    m = read_ann_manifest(idx)
    assert m["rows"] == 2 * n0  # advisory count includes the dupes
    data = os.path.join(idx, m["data"])
    phys0 = spark.read.parquet(data).filter(F.col("tbl") == 0).count()
    assert phys0 == 2 * n0

    out = resize_ann_index(spark, idx)
    assert not out["resized"] and out["compacted"]
    assert out["rows"] == n0
    m2 = read_ann_manifest(idx)
    assert m2["bits"] == m["bits"] and m2["rows"] == n0
    assert m2["data"] != m["data"]  # rewrite went to a new version
    data2 = os.path.join(idx, m2["data"])
    assert (
        spark.read.parquet(data2).filter(F.col("tbl") == 0).count() == n0
    )
    assert _rows(probe_ann_index(spark, queries, idx)) == before


def test_crashed_resize_leaves_old_index_live(spark, emb, tmp_path):
    """A resize that crashed before its manifest flip: the orphan
    data dir is invisible to probes (manifest still points at the old
    width) and the next maintenance pass garbage-collects it."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    build_ann_index(spark, corpus, idx, bits=8)
    before = _rows(probe_ann_index(spark, queries, idx))

    orphan = os.path.join(idx, "rows_h12")
    os.makedirs(os.path.join(orphan, "tbl=0", "cb=0"))
    assert _rows(probe_ann_index(spark, queries, idx)) == before

    resize_ann_index(spark, idx)  # GC runs even when bits don't change
    assert not os.path.isdir(orphan)


def test_resize_snapshot_skips_inflight_temporary(spark, emb, tmp_path):
    """ADVICE r12 (high): the lock-free resize snapshot walks the data
    dir with os.walk, which — unlike Spark's directory read — does not
    skip hidden paths. A SIGKILLed locked append leaves truncated
    task-attempt parquet under ``tbl=0/_temporary/``; baking it into
    the snapshot crashes the explicit-path read (or the footer
    arithmetic) on every subsequent rebuild — a permanent wedge."""
    from irio2024_mapreduce_spark.operators.ann_index import _tbl0_files

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    build_ann_index(spark, corpus, idx)  # default bits: resize is a no-op
    before = _rows(probe_ann_index(spark, queries, idx))
    data_dir = os.path.join(idx, read_ann_manifest(idx)["data"])
    tmp_dir = os.path.join(
        data_dir, "tbl=0", "_temporary", "0", "task_000", "pb=0"
    )
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, "part-crashed.parquet"), "wb") as f:
        f.write(b"truncated, not parquet")
    assert not any(
        "_temporary" in p for p in _tbl0_files(data_dir)
    ), "in-flight task-attempt files leaked into the snapshot set"
    out = resize_ann_index(spark, idx)  # must not wedge on the junk
    # the junk file must not enter the no-op path's footer-delta
    # arithmetic either (it is unreadable parquet)
    assert not out["resized"], out
    assert _rows(probe_ann_index(spark, queries, idx)) == before


def test_resize_stages_under_unique_name_and_gcs_leftovers(
    spark, emb, tmp_path
):
    """ADVICE r13-input (medium): the lock-free resize must never
    stage at the versioned name a racing full build would also write
    (two interleaved overwrites → one corrupt committed dir). It
    stages under ``stage_rows_*`` — a name outside every builder's and
    GC's prefix — renamed under the index lock; crashed stage dirs
    are GC'd at guard acquisition."""
    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    h = build_ann_index(spark, corpus, idx)["bits"]
    before = _rows(probe_ann_index(spark, queries, idx))
    # a SIGKILLed predecessor's stage leftover
    crashed = os.path.join(idx, f"stage_rows_h{h}_v2.424242")
    os.makedirs(os.path.join(crashed, "tbl=0", "pb=0"))
    # a crashed direct writer's orphan at the NEXT versioned name,
    # with junk inside — the rename path must replace it wholesale
    orphan = os.path.join(idx, f"rows_h{h}_v2")
    junk = os.path.join(orphan, "tbl=0", "pb=0", "part-junk.parquet")
    os.makedirs(os.path.dirname(junk))
    with open(junk, "wb") as f:
        f.write(b"junk")
    # duplicate appends force the rewrite path (same width, dups)
    append_ann_index(spark, corpus.limit(3), idx)
    out = resize_ann_index(spark, idx)
    assert out["compacted"] and not out["resized"], out
    assert not os.path.isdir(crashed), "stage leftover survived GC"
    m = read_ann_manifest(idx)
    assert m["data"] == f"rows_h{h}_v2"
    assert not os.path.exists(junk), (
        "crashed orphan's junk baked into the committed dir"
    )
    assert _rows(probe_ann_index(spark, queries, idx)) == before


def test_resize_classifies_vanished_input(spark, emb, tmp_path, monkeypatch):
    """ADVICE r12 (low): maintenance entry points classify
    vanished-input Py4J failures to the protocol's documented
    retryable instead of leaking an opaque JVM traceback."""
    import irio2024_mapreduce_spark.operators.ann_index as mod

    idx = str(tmp_path / "ann")
    build_ann_index(
        spark, emb.filter(F.col("vec_id") >= N_QUERIES), idx
    )

    def boom(*a, **k):
        raise Exception(
            "java.io.FileNotFoundException: File file:"
            f"{idx}/rows_h8_v1/tbl=0/pb=3/part-0.parquet does not exist"
        )

    monkeypatch.setattr(mod, "_resize_ann_index_locked", boom)
    with pytest.raises(RuntimeError, match="vanished beneath"):
        resize_ann_index(spark, idx)


def test_probe_opens_only_probed_partition_dirs(
    spark, emb, tmp_path, monkeypatch
):
    """r12 verdict item 4: make the 'point-read probe' claim a pinned
    bound — the probe's scan opens EXACTLY the probed (tbl, pb)
    partition dirs (computed from the query signatures), and that set
    is a strict subset of the index's dirs (pruning is real). r14:
    the adaptive part_bits sizing gives a test-scale corpus very few
    (fat) dirs by design, so pin the pruning bound at a forced
    many-dir geometry by shrinking the per-dir row target."""
    import irio2024_mapreduce_spark.operators.ann_index as ann_mod

    from irio2024_mapreduce_spark.operators.ann_index import _pb_shift

    monkeypatch.setattr(ann_mod, "DIR_TARGET_ROWS", 8)
    from irio2024_mapreduce_spark.operators.similarity import (
        _ann_query_probes,
        _ann_sigs,
    )

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    # ONE query: the 10-query union can legitimately cover every
    # dir at fixture scale — the bound is per-probe-list, and a
    # single query makes the strict-subset check meaningful
    queries = emb.filter(F.col("vec_id") == 0)
    m = build_ann_index(spark, corpus, idx)
    data_dir = os.path.realpath(os.path.join(idx, m["data"]))
    res = probe_ann_index(spark, queries, idx)
    opened = {
        os.path.dirname(f[len("file:"):] if f.startswith("file:") else f)
        for f in res.inputFiles()
    }
    opened = {os.path.realpath(d) for d in opened}
    opened_in_index = {d for d in opened if d.startswith(data_dir)}
    assert opened_in_index, "probe read no stored files?"
    # the probed parents, recomputed from the same shared machinery
    shift = _pb_shift(m["bits"], m["part_bits"])
    probes = _ann_query_probes(
        _ann_sigs(queries, m["bits"]), m["bits"], max_id=None
    )
    pairs = {
        (r["qtbl"], r["probe"])
        for r in probes.select("qtbl", "probe").distinct().collect()
    }
    parents = {
        os.path.realpath(os.path.join(data_dir, f"tbl={t}", f"pb={b >> shift}"))
        for t, b in pairs
    }
    assert opened_in_index <= parents, (
        opened_in_index - parents
    )
    # pruning is real: the index has more partition dirs than probed
    all_dirs = {
        os.path.realpath(root)
        for root, _d, files in os.walk(data_dir)
        if any(f.endswith(".parquet") for f in files)
    }
    assert len(parents & all_dirs) < len(all_dirs), (
        "probe list covers every dir — no pruning to pin at this scale"
    )


def _plant_delta(spark, idx, emb_delta, tag="b=test.1"):
    """Publish a batch as ingest does (r13): delta-shaped write +
    rename into the live delta area + advisory rows bump."""
    from irio2024_mapreduce_spark.operators.ann_index import (
        _deltas_root,
        _write_manifest,
        delta_shaped_rows,
    )

    m = read_ann_manifest(idx)
    droot = _deltas_root(idx, m["data"])
    os.makedirs(droot, exist_ok=True)
    staged = os.path.join(droot, tag + ".staging")
    delta_shaped_rows(
        emb_delta, m["bits"], nparts=1, part_bits=m["part_bits"]
    ).write.mode("overwrite").partitionBy("tbl").parquet(staged)
    from irio2024_mapreduce_spark.sources.sinks import write_filelist

    write_filelist(spark, staged)  # as ingest's _stage_batch does (r14)
    os.rename(staged, os.path.join(droot, tag))
    n = emb_delta.count()
    _write_manifest(idx, {**m, "rows": m["rows"] + n})
    return n


def test_probe_unions_unfolded_deltas_and_fold_preserves_answers(
    spark, emb, tmp_path
):
    """r12 verdict item 5: batches publish as per-batch delta dirs —
    probes must see delta rows immediately (visibility = directory
    presence), and the maintenance fold must move them into the
    two-level layout without changing a single answer."""
    from irio2024_mapreduce_spark.operators.ann_index import (
        _delta_files,
        _deltas_root,
        fold_ann_deltas,
    )

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    build_ann_index(spark, half_a, idx)
    _plant_delta(spark, idx, half_b)
    m = read_ann_manifest(idx)
    assert _delta_files(idx, m["data"]), "delta publish left no files"

    # reference: one index holding everything via the locked append
    ref = str(tmp_path / "ann_ref")
    build_ann_index(spark, half_a, ref, bits=m["bits"])
    append_ann_index(spark, half_b, ref)
    want = _rows(probe_ann_index(spark, queries, ref))
    got = _rows(probe_ann_index(spark, queries, idx))
    assert got == want and len(got) > 0

    out = fold_ann_deltas(spark, idx)
    from irio2024_mapreduce_spark.operators.ann_index import ANN_TABLES

    # folded counts INDEX rows: one per (vector, table)
    assert out["folded"] == half_b.count() * ANN_TABLES
    assert out["batches"] == 1
    assert not _delta_files(idx, m["data"])
    # the fold left no stray dirs under the delta root
    droot = _deltas_root(idx, m["data"])
    assert not [d for d in os.listdir(droot) if d.startswith("b=")]
    assert _rows(probe_ann_index(spark, queries, idx)) == want
    # folded rows are physically in the layout now
    layout0 = spark.read.parquet(
        os.path.join(idx, m["data"])
    ).filter(F.col("tbl") == 0)
    assert layout0.count() == corpus.count()
    # idempotent: nothing left to fold
    assert fold_ann_deltas(spark, idx)["folded"] == 0


def test_resize_absorbs_unfolded_deltas(spark, emb, tmp_path):
    """The resize snapshot unit is layout ∪ delta area: a rewrite
    (here: duplicate-collapse) must carry delta vectors into the new
    version and GC the old version's delta root with it."""
    from irio2024_mapreduce_spark.operators.ann_index import (
        _corpus_tbl0_files,
    )

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    h = build_ann_index(spark, half_a, idx)["bits"]
    _plant_delta(spark, idx, half_b)
    # duplicate append forces the same-width rewrite path
    append_ann_index(spark, half_a.limit(3), idx)
    out = resize_ann_index(spark, idx)
    assert out["compacted"], out
    m2 = read_ann_manifest(idx)
    assert m2["data"].startswith(f"rows_h{h}_v")
    # old version + its delta root GC'd; new version holds everything
    assert not os.path.isdir(os.path.join(idx, f"rows_h{h}_v1"))
    assert not os.path.isdir(
        os.path.join(idx, f"rows_h{h}_v1.deltas")
    )
    stored = spark.read.parquet(*sorted(_corpus_tbl0_files(idx, m2["data"])))
    assert stored.select("neighbor_id").distinct().count() == corpus.count()
    # answers equal a clean full build at the same width
    ref = str(tmp_path / "ann_ref")
    build_ann_index(spark, corpus, ref, bits=h)
    assert _rows(probe_ann_index(spark, queries, idx)) == _rows(
        probe_ann_index(spark, queries, ref)
    )


def test_part_bits_sizing_rule():
    """r14: partition-dir count adapts to corpus rows — few fat dirs
    at test/fixture scale (the file-open wall fix), the full 2^8
    geometry at ≥1M rows — and never exceeds the signature width."""
    from irio2024_mapreduce_spark.operators.ann_index import (
        DIR_TARGET_ROWS,
        PART_BITS,
        part_bits_for,
    )

    assert part_bits_for(0, 24) == 0
    assert part_bits_for(DIR_TARGET_ROWS, 24) == 0
    assert part_bits_for(18_000, 24) == 2       # the sf0.1 fixture
    assert part_bits_for(1_100_000, 24) == PART_BITS  # saturates
    assert part_bits_for(10**12, 24) == PART_BITS     # stays capped
    assert part_bits_for(10**12, 3) == 3        # never exceeds bits


def test_probe_filelist_sidecar_matches_listing_fallback(
    spark, emb, tmp_path
):
    """r14 (verdict item 1): the layout's `_filelist.json` sidecar —
    maintained by every locked writer — must resolve the probe to the
    SAME answers as the pre-r14 per-dir listing fallback, with delta
    batches resolved through their own per-batch sidecars."""
    from irio2024_mapreduce_spark.operators.ann_index import (
        _deltas_root,
    )
    from irio2024_mapreduce_spark.sources.sinks import FILELIST_NAME

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    m = build_ann_index(spark, half_a, idx)
    data_dir = os.path.join(idx, m["data"])
    assert os.path.exists(os.path.join(data_dir, FILELIST_NAME))
    _plant_delta(spark, idx, half_b)
    droot = _deltas_root(idx, m["data"])
    bdir = os.path.join(droot, "b=test.1")
    assert os.path.exists(os.path.join(bdir, FILELIST_NAME))

    with_sidecar = _rows(probe_ann_index(spark, queries, idx))
    assert with_sidecar
    # the sidecar resolves to concrete FILES (point reads, no LISTs)
    opened = probe_ann_index(spark, queries, idx).inputFiles()
    assert all(f.endswith(".parquet") for f in opened)
    # fallback: delete both sidecars → per-dir listing, same answers
    os.remove(os.path.join(data_dir, FILELIST_NAME))
    os.remove(os.path.join(bdir, FILELIST_NAME))
    assert _rows(probe_ann_index(spark, queries, idx)) == with_sidecar


def test_probe_retries_once_then_classifies_vanished_input(
    spark, emb, tmp_path, monkeypatch
):
    """r14 (ADVICE, medium): a probe racing a maintenance fold that
    drops just-folded delta dirs must either succeed on its one
    fresh-listing retry or fail with the protocol's documented
    retryable — never a raw Py4JJavaError."""
    import irio2024_mapreduce_spark.operators.ann_index as ann_mod

    idx = str(tmp_path / "ann")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    build_ann_index(spark, corpus, idx)
    want = _rows(probe_ann_index(spark, queries, idx))
    m = read_ann_manifest(idx)
    data_dir = os.path.join(idx, m["data"])

    real = ann_mod.read_filelist
    calls = {"n": 0}

    def phantom_then_real(path):
        side = real(path)
        if path == data_dir:
            calls["n"] += 1
            if calls["n"] == 1 and side is not None:
                # first resolve sees files a "fold" just deleted
                side = {
                    **side,
                    "files": {
                        rel: fs + ["part-vanished.snappy.parquet"]
                        for rel, fs in side["files"].items()
                    },
                }
        return side

    monkeypatch.setattr(ann_mod, "read_filelist", phantom_then_real)
    # first attempt fails on the phantom file; the retry re-reads the
    # (now truthful) sidecar and succeeds
    assert _rows(probe_ann_index(spark, queries, idx)) == want
    assert calls["n"] == 2

    # when the vanished state PERSISTS, the failure is classified
    calls["n"] = 0

    def always_phantom(path):
        side = real(path)
        if path == data_dir and side is not None:
            side = {
                **side,
                "files": {
                    rel: fs + ["part-vanished.snappy.parquet"]
                    for rel, fs in side["files"].items()
                },
            }
        return side

    monkeypatch.setattr(ann_mod, "read_filelist", always_phantom)
    with pytest.raises(RuntimeError, match="vanished beneath"):
        probe_ann_index(spark, queries, idx).collect()
