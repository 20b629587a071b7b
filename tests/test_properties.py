"""Property-based tests (SURVEY.md §5.2): the reference tokenizer
regex is the specification; Spark must agree with pure Python on
arbitrary text."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from irio2024_mapreduce_spark.functions.text import TOKEN_SPLIT_REGEX, wordcount

# words + punctuation + whitespace + some unicode, biased toward
# separator-heavy strings (the adversarial region)
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abAB12!,.;:-_()[]{}'\"\t ") + ["é", "東"]
    ),
    max_size=200,
)


def python_wordcount(lines: list[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for line in lines:
        for tok in filter(len, re.split(TOKEN_SPLIT_REGEX, line)):
            counts[tok] = counts.get(tok, 0) + 1
    return counts


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=5))
def test_spark_tokenizer_matches_python_spec(spark, lines):
    # newlines inside generated text would change line splitting —
    # normalize them away so both sides see identical records
    lines = [ln.replace("\n", " ").replace("\r", " ") for ln in lines]
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    got = {(r["word"], r["cnt"]) for r in wordcount(df).collect()}
    assert got == set(python_wordcount(lines).items())


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=80))
def test_python_spec_never_emits_separators(text):
    """Sanity on the spec itself: no token contains ASCII punctuation
    or whitespace."""
    for tok in filter(len, re.split(TOKEN_SPLIT_REGEX, text)):
        assert not re.search(TOKEN_SPLIT_REGEX, tok)
