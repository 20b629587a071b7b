"""Driver-contract invariants."""

from __future__ import annotations

from irio2024_mapreduce_spark import registry


def test_every_oracle_key_has_a_query():
    qs = registry.queries()
    osql = registry.oracle_sql()
    assert set(osql) <= set(qs)
    # rows-only queries are deliberate, enumerated exceptions
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "dedup_near",
        "dedup_simhash",
        "similarity_ann",
        "dedup_clusters",
        "sketches",
        "multimodal_pipeline",
        "multimodal_frames",
        "similarity_ivf",
    }


def test_registry_fits_driver_window():
    # the driver grades only the first 50 entries (r01: 55 registered,
    # exactly 50 graded) — every registered query must be inside
    assert len(registry.queries()) <= registry.DRIVER_QUERY_WINDOW


def test_entry_smoke(spark):
    df = registry.entry(spark)
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0


def test_bench_headline_queries_are_registered():
    # bench.py errors at runtime on missing names; catch it at test
    # time instead so retiring a twin can't silently break the bench
    import bench

    assert set(bench.HEADLINE) <= set(registry.queries())
