"""Source readers: explicit-schema CSV/JSONL ingestion with
queryable corruption, and multi-file text isolation (reference
R1/R10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from irio2024_mapreduce_spark.sources.tables import (
    read_csv_dir,
    read_jsonl_dir,
    read_text_dir,
)

DOC_SCHEMA = "doc_id long, lang string, text string"


def test_read_csv_dir_explicit_schema_and_corruption(spark, tmp_path):
    d = tmp_path / "csv_src"
    d.mkdir()
    (d / "a.csv").write_text(
        "doc_id,lang,text\n1,en,hello world\n2,de,hallo welt\n"
    )
    # file b: row 4 is malformed (too many columns for the schema)
    (d / "b.csv").write_text(
        "doc_id,lang,text\n3,fr,bonjour\nnot_a_long,xx,oops\n"
    )
    df = read_csv_dir(spark, str(d), DOC_SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    good = {
        r["doc_id"]: r["text"]
        for r in rows
        if r["_corrupt_record"] is None
    }
    assert good == {1: "hello world", 2: "hallo welt", 3: "bonjour"}
    # the malformed line is captured verbatim, queryable — not
    # silently dropped, not failing the job
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1
    assert "not_a_long" in bad[0]["_corrupt_record"]
    assert bad[0]["doc_id"] is None


def test_read_jsonl_dir_explicit_schema_and_corruption(spark, tmp_path):
    d = tmp_path / "jsonl_src"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "lang": "en", "text": "hello"}\n'
        '{"doc_id": 2, "lang": "de", "text": "hallo"}\n'
    )
    (d / "b.jsonl").write_text(
        '{"doc_id": 3, "lang": "fr", "text": "bonjour"}\n'
        "{this is not json}\n"
    )
    df = read_jsonl_dir(spark, str(d), DOC_SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    good = {
        r["doc_id"]: r["text"]
        for r in rows
        if r["_corrupt_record"] is None
    }
    assert good == {1: "hello", 2: "hallo", 3: "bonjour"}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "this is not json" in bad[0]["_corrupt_record"]


def test_read_text_dir_files_never_bleed(spark, tmp_path):
    """R1/R10: every line belongs to exactly one file; a file without
    a trailing newline must not merge with the next file's first
    line."""
    d = tmp_path / "text_src"
    d.mkdir()
    (d / "one.txt").write_text("alpha beta")  # no trailing newline
    (d / "two.txt").write_text("gamma\ndelta\n")
    lines = sorted(
        r["value"] for r in read_text_dir(spark, str(d)).collect()
    )
    assert lines == ["alpha beta", "delta", "gamma"]


def test_csv_reader_prunes_columns(spark, tmp_path):
    """Column pruning must reach the CSV scan: a projection of one
    column reads a one-column schema (ReadSchema in the plan)."""
    import contextlib
    import io

    d = tmp_path / "csv_prune"
    d.mkdir()
    (d / "a.csv").write_text("doc_id,lang,text\n1,en,hello\n")
    df = read_csv_dir(spark, str(d), DOC_SCHEMA).select("lang")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "lang" in read_schema and "text" not in read_schema
