"""Word-count tokenizer with exact reference parity (SURVEY.md §1.3).

The reference tokenizes by splitting on one-or-more ASCII
punctuation/whitespace characters, case-SENSITIVE, dropping empty
tokens (``mapreduce/worker/algorithm.py:9-11``; its regex is built
from ``string.punctuation`` + ``\\s``).

``string.punctuation`` is exactly the four contiguous ASCII ranges
``!-/``, ``:-@``, ``[-`` + backtick, ``{-~`` — so one character-class
literal expresses it identically in Java regex (Spark), RE2 (DuckDB)
and Python ``re``. Constant-folded by Catalyst; the whole plan stays
inside whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One-or-more ASCII punctuation or whitespace chars — the split
# delimiter. Verified equal to re.escape(string.punctuation)+\s
# semantics by tests/test_wordcount.py.
#
# Whitespace is an EXPLICIT class, not \s: \s differs across the three
# regex engines this constant feeds (Java \s includes \x0b, RE2's \s
# does not, Python's is Unicode-wide without re.ASCII). The explicit
# class [ \t\n\x0b\f\r] is Python's re.ASCII \s — the reference's
# semantics — and parses identically in Java, RE2 and Python.
TOKEN_SPLIT_REGEX = "[!-/:-@\\[-`{-~ \\t\\n\\x0b\\f\\r]+"

# Sanity: the char-class ranges must cover string.punctuation exactly.
_RANGES = [(33, 47), (58, 64), (91, 96), (123, 126)]
assert set(string.punctuation) == {
    chr(c) for lo, hi in _RANGES for c in range(lo, hi + 1)
}


def tokenize(col: Column | str) -> Column:
    """text column → array<string> of tokens (empties NOT yet removed)."""
    return F.split(col, TOKEN_SPLIT_REGEX)


def wordcount(df: DataFrame, text_col: str = "value") -> DataFrame:
    """The reference's flagship query (R1–R10 fused, SURVEY.md §2.2).

    scan → flatMap(tokenize) → filter empties → hash-aggregate count.
    Spark's partial+final HashAggregate reproduces the reference's
    map-side ``word,1`` emit + reduce-side sum
    (``mapreduce/worker/algorithm.py:11,19``) with map-side combine.

    Result columns: ``word string, cnt bigint`` (order unspecified —
    the reference compares order-insensitively,
    ``tests/whitebox_tests/tests.py:53-56``).
    """
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
