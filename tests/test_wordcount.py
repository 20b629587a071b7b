"""Reference-parity word-count tests (SURVEY.md §5.2).

The three golden cases from the reference's e2e suite
(``mapreduce/tests/whitebox_tests/tests.py:73-86``), re-synthesized
per FIXTURES.md §A, run through the §2.2 plan, compared
order-insensitively — with ``sorted(...)``, not the reference
harness's latent ``.sort()`` bug (``tests.py:54-55``).
"""

from __future__ import annotations

import re
import string

import pytest

from irio2024_mapreduce_spark.functions.text import TOKEN_SPLIT_REGEX, wordcount


def run_wc(spark, path: str) -> set[tuple[str, int]]:
    df = wordcount(spark.read.text(str(path)))
    return {(r["word"], r["cnt"]) for r in df.collect()}


def test_single_word(spark, tmp_path):
    # 'word' wrapped in runs of every ASCII punctuation char (32) plus
    # one whitespace-separated occurrence = 33 total
    parts = [f"{c}{c}word{c}" for c in string.punctuation] + ["word"]
    (tmp_path / "single_word_input").write_text(" ".join(parts))
    assert run_wc(spark, tmp_path) == {("word", 33)}


def test_multiple_words_file_boundaries(spark, tmp_path):
    # 3 files, no trailing newlines; naive byte concatenation would
    # fuse input2's last token with input3's first (FIXTURES.md §A)
    (tmp_path / "multiple_words_input1").write_text("word1 word2 word3")
    (tmp_path / "multiple_words_input2").write_text("word2 word3 word1")
    (tmp_path / "multiple_words_input3").write_text("word3 word2 word1")
    assert run_wc(spark, tmp_path) == {
        ("word1", 3),
        ("word2", 3),
        ("word3", 3),
    }


def test_big_file_split_path(spark, tmp_path):
    # >128 KiB forces the reference's split path; counts must not be
    # lost or doubled at split boundaries. Golden: word,1050625 = 1025²
    line = " ".join(["word"] * 1025) + "\n"
    (tmp_path / "big_file_input").write_text(line * 1025)
    assert run_wc(spark, tmp_path) == {("word", 1025 * 1025)}


def test_tokenizer_case_sensitive_no_lowercase(spark, tmp_path):
    (tmp_path / "f").write_text("Word word WORD word")
    assert run_wc(spark, tmp_path) == {
        ("Word", 1),
        ("word", 2),
        ("WORD", 1),
    }


def test_tokenizer_matches_python_reference(spark, tmp_path):
    """Property: Spark tokenization == pure-Python re.split with the
    reference's regex (mapreduce/worker/algorithm.py:9 semantics)."""
    samples = [
        "a,b;;c  d--e",
        "!!!leading and trailing???",
        "tabs\tand\nnewlines\r\nmixed",
        "unicode stays intact: naïve café 東京",
        "numbers 123 mix3d t0kens",
        "",
        "    ",
        "a" * 500,
    ]
    (tmp_path / "f").write_text("\n".join(samples))
    expected: dict[str, int] = {}
    for line in "\n".join(samples).split("\n"):
        for tok in filter(len, re.split(TOKEN_SPLIT_REGEX, line)):
            expected[tok] = expected.get(tok, 0) + 1
    assert run_wc(spark, tmp_path) == set(expected.items())


@pytest.mark.parametrize("punct", list(string.punctuation))
def test_every_punctuation_char_separates(spark, tmp_path, punct):
    (tmp_path / "f").write_text(f"aa{punct}bb")
    assert run_wc(spark, tmp_path) == {("aa", 1), ("bb", 1)}


def test_tokenizer_control_char_parity_across_engines(spark):
    """\\x0b (vertical tab) is where Java's \\s, RE2's \\s and Python's
    \\s disagree — the explicit whitespace class in TOKEN_SPLIT_REGEX
    must make all three engines split identically, and NBSP (\\xa0,
    Unicode whitespace) must NOT split on any of them (reference
    parity: Python re.ASCII)."""
    import re

    import duckdb

    from irio2024_mapreduce_spark.functions.text import (
        TOKEN_SPLIT_REGEX,
        wordcount,
    )

    texts = ["a\x0bb", "x\xa0y", "p\tq r\ns"]
    df = spark.createDataFrame([(t,) for t in texts], ["value"])
    got = {(r["word"], r["cnt"]) for r in wordcount(df).collect()}

    # Python reference semantics (re.ASCII \s == the explicit class)
    pyre = re.compile(TOKEN_SPLIT_REGEX)
    want: dict[str, int] = {}
    for t in texts:
        for w in pyre.split(t):
            if w:
                want[w] = want.get(w, 0) + 1
    assert got == set(want.items())
    assert ("a", 1) in got and ("b", 1) in got          # \x0b splits
    assert ("x\xa0y", 1) in got                          # NBSP doesn't

    # DuckDB (RE2) agrees
    con = duckdb.connect()
    duck = {}
    for t in texts:
        for (w,) in con.execute(
            "SELECT unnest(regexp_split_to_array(?, ?))",
            [t, TOKEN_SPLIT_REGEX],
        ).fetchall():
            if w:
                duck[w] = duck.get(w, 0) + 1
    assert set(duck.items()) == got


@pytest.mark.slow  # r15: chaos/soak class, off the default gate path
def test_task_failure_recovery_chaos_analog():
    """The reference's chaos test (delete a worker pod mid-job,
    assert golden output still converges) translated to Spark's
    recovery mechanism: tools/chaos_probe.py runs wordcount under
    local[4,2] with one injected task failure (first attempt of one
    partition dies AFTER yielding a batch) and asserts the retried
    run's output is identical to a clean run — lineage re-executes
    the lost task and discards the failed attempt's partial output.
    Subprocess because a retrying master can't be set on the shared
    test SparkContext."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "chaos_probe.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"},
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(last)
    assert rep["identical_to_clean_run"] is True
    assert rep["rows"] > 0
    # the injection genuinely fired: the failed attempt's error is in
    # the driver log (otherwise this test proves nothing)
    assert "chaos probe: injected task failure" in (
        out.stdout + out.stderr
    )
