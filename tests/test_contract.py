"""Driver-contract invariants."""

from __future__ import annotations

from irio2024_mapreduce_spark import registry


def test_every_oracle_key_has_a_query():
    qs = registry.queries()
    osql = registry.oracle_sql()
    assert set(osql) <= set(qs)
    # r9: EVERY registered query has a full oracle. The last two
    # rows-only rows closed: similarity_ivf's trained centroids are
    # deterministic constants of (data, code) and are injected into
    # the SQL after an out-of-Spark training replay (bit-exact xxh64
    # sample selection + the same numpy Lloyd fixpoint); the graded
    # near-dedup row is now the md5-hash-family twin dedup_near_md5
    # (identical pipeline, DuckDB-computable hash), with the xxhash64
    # production default retired to the rows-only local pool.
    rows_only = set(qs) - set(osql)
    assert rows_only == set()


def test_registry_fits_driver_window():
    # the driver grades only the first 50 entries (r01: 55 registered,
    # exactly 50 graded) — every registered query must be inside
    assert len(registry.queries()) <= registry.DRIVER_QUERY_WINDOW


def test_entry_smoke(spark):
    df = registry.entry(spark)
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0


# The driver's grading window is POSITIONAL: it grades the first 50
# queries() entries in dict order. This snapshot pins the exact ordered
# list so a module reorder or an insertion can never silently change
# which queries are graded — any change here must be an explicit,
# reviewed edit.
EXPECTED_QUERY_ORDER = [
    "wordcount", "custom_step_udf", "streaming_wordcount",
    "streaming_event_counts", "streaming_sessionize",
    "streaming_click_purchase_join",
    "multimodal_pipeline", "multimodal_meta", "multimodal_frames",
    "filter_project", "agg_groupby", "agg_distinct", "agg_rollup",
    "join_broadcast", "join_shuffle", "join_semi_anti", "join_outer",
    "window_rank", "window_running", "sort_limit_topk", "set_ops",
    "scalar_funcs", "join_range", "join_asof", "pivot_status_priority",
    "stats_pack", "grouping_sets", "time_rollup",
    "conditional_agg", "deterministic_sample", "doc_chunk",
    "dedup_clusters", "event_sliding",
    "event_session", "json_extract", "array_ops", "dedup_exact",
    "dedup_near_md5", "dedup_ngram_jaccard",
    "dedup_embedding", "dedup_incremental",
    # r12: the graded ANN slot is the STORED-index path (r11 verdict
    # item 5) — probe_ann_index builds/probes the versioned on-disk
    # index; the fly twin similarity_ann retired to the locally-
    # verified pool (bit parity pinned in tests/test_ann_index.py)
    "similarity_topk", "probe_ann_index",
    # r13: the graded IVF slot is the STORED-index path too (r12
    # verdict item 6) — probe_ivf_index builds/probes the versioned
    # cell-partitioned index; the fly twin similarity_ivf retired to
    # the locally-verified pool (parity pinned in
    # tests/test_ivf_index.py; its data-dependent oracle is replayed
    # per sf_dir by tests/test_retired_twins.py)
    "probe_ivf_index", "text_analysis", "lang_id", "quality_score",
    "quality_funnel", "bm25_search",
    "decontaminate",
]


def test_registry_order_is_pinned():
    assert list(registry.queries()) == EXPECTED_QUERY_ORDER


def test_json_corpus_free_of_engine_asymmetric_leniency():
    """json_extract is hash-graded while Jackson (Spark) and yyjson
    (DuckDB) disagree on two leniency classes: Jackson tolerates
    trailing garbage after a valid value, yyjson tolerates trailing
    commas. No engine switch aligns them, so the oracle contract
    instead REQUIRES the corpus to be free of both classes — asserted
    here over every graded scale factor (strictly-valid JSON is parsed
    identically by both engines and needs no check)."""
    import json
    import os

    import pandas as pd

    decoder = json.JSONDecoder()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        props = pd.read_parquet(path, columns=["props"])["props"]
        for p in props:
            if p is None or not isinstance(p, str):
                continue
            try:
                json.loads(p)
                continue  # strictly valid → both engines agree
            except ValueError:
                pass
            stripped = p.strip()
            # Jackson-only leniency: valid JSON prefix + trailing junk
            try:
                _, end = decoder.raw_decode(stripped)
                assert end >= len(stripped), (
                    f"corpus value with trailing garbage (Jackson accepts, "
                    f"yyjson rejects): {p!r}"
                )
            except ValueError:
                pass  # no valid prefix → both engines reject
            # yyjson-only leniency: trailing comma before a closer
            import re

            assert not re.search(r",\s*[}\]]\s*\Z", stripped), (
                f"corpus value with trailing comma (yyjson accepts, "
                f"Jackson rejects): {p!r}"
            )


def test_bench_headline_queries_are_registered():
    # bench.py errors at runtime on missing names; catch it at test
    # time instead so retiring a twin can't silently break the bench
    import bench

    from irio2024_mapreduce_spark.operators import dedup, similarity

    # dedup_simhash (r8) and similarity_ann (r12) were retired from
    # the driver window but stay benched (perf-series continuity) —
    # bench resolves them from the retired pools, so the benchable
    # surface is the union
    assert set(bench.HEADLINE) <= (
        set(registry.queries())
        | set(dedup.RETIRED_ROWS_ONLY_QUERIES)
        | set(similarity.RETIRED_TWIN_QUERIES)
    )
    # the r01-comparable subtotal must cover EXACTLY the rounds-1/2
    # HEADLINE (no swaps, drops, or duplicates) — else the cross-round
    # comparison the field exists for is silently wrong
    assert sorted(bench.R01_COMPARABLE) == sorted(
        [
            "wordcount", "filter_project", "agg_groupby", "agg_rollup",
            "join_broadcast", "join_shuffle", "join_outer",
            "window_running", "sort_limit_topk", "event_sliding",
            "event_session", "json_extract", "dedup_exact", "dedup_near",
            "similarity_topk", "text_analysis", "join_asof", "stats_pack",
            "time_rollup", "conditional_agg",
        ]
    )
    assert set(bench.R01_COMPARABLE) <= set(bench.HEADLINE)


def test_bench_summary_line_fits_driver_tail_capture():
    # BENCH_r05.json came back "parsed": null because the enriched
    # stdout line outgrew the driver's ~2 KiB tail capture. The final
    # stdout line is now the compact summary only; pin its worst-case
    # size so a future field addition can't silently reintroduce the
    # overflow. Worst case: every query at 9999.999 s.
    import json

    import bench

    worst = {
        "metric": "headline_queries_total_time",
        "value": 99999.999,
        "unit": "sec",
        "value_r01_comparable_subset": 99999.999,
        "queries": {name: 9999.999 for name in bench.HEADLINE},
        "transient_count": len(bench.HEADLINE),
        "machine_canary_sec": 9999.999,
        "detail": "BENCH_DETAIL_last.json",
        "sf": "/root/testdata/sf0.1",
        "load_avg_start": [99.99, 99.99, 99.99],
        "load_avg_end": [99.99, 99.99, 99.99],
    }
    assert len(json.dumps(worst)) < 1800
