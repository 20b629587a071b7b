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


# ---- r6 LLM-prep properties -------------------------------------------

# token soup biased toward PII-shaped fragments and separator mess
PII_TEXT = st.lists(
    st.sampled_from(
        ["ab", "z9", "a@b.io", "user@example.com", "192.168.0.1",
         "1.2.3.4.5", "555-123-4567", "12-34", "@", ".", "-", "<", ">",
         " ", "\t", "\n", "  "]
    ),
    max_size=25,
).map("".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(PII_TEXT, min_size=1, max_size=4))
def test_scrub_text_is_idempotent(spark, texts):
    """Scrubbing an already-scrubbed text changes nothing: the
    replacement tokens (<EMAIL>/<IP>/<PHONE>) and collapsed
    whitespace contain no residual matches for any pattern. An
    operator a pipeline may apply twice (re-run, backfill) must be a
    fixpoint or it silently mangles clean data."""
    from irio2024_mapreduce_spark.operators.llm_prep import scrub_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    once = scrub_text(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = scrub_text(once).select("doc_id", "clean_text")
    got = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
    want = {
        r["doc_id"]: r["text"] for r in once.collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=1, max_value=900), min_size=1, max_size=40
    )
)
def test_pack_assignment_matches_python_reference(spark, token_counts):
    """The distributed pack assignment must equal a 10-line Python
    reference on arbitrary token-count multisets (hash layout order
    recomputed Python-side with the same md5 rule)."""
    import hashlib

    from irio2024_mapreduce_spark.operators.llm_prep import (
        PACK_MAX_TOKENS,
        _assign,
        _keyed_tokens,
    )

    rows = [(i, "w " * (n - 1) + "w") for i, n in enumerate(token_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keyed = _keyed_tokens(docs)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("shuffle_key", "doc_id")
    packed = _assign(
        keyed.withColumn("cum", F.sum("n_tokens").over(w)).select(
            "doc_id",
            "n_tokens",
            (F.col("cum") - F.col("n_tokens")).alias("seq_offset"),
        )
    )
    got = {
        r["doc_id"]: (r["seq_offset"], r["pack_id"], r["spans_boundary"])
        for r in packed.collect()
    }

    order = sorted(
        range(len(token_counts)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    off = 0
    for i in order:
        n = token_counts[i]
        expect = (
            off,
            off // PACK_MAX_TOKENS,
            int((off + n - 1) // PACK_MAX_TOKENS != off // PACK_MAX_TOKENS),
        )
        assert got[i] == expect, (i, got[i], expect)
        off += n


# ---- r9: quantization + split properties ------------------------------

FINITE_FLOATS = st.floats(
    min_value=-3.3999999521443642e38,
    max_value=3.3999999521443642e38,
    allow_nan=False,
    allow_infinity=False,
    width=32,  # the embedding column is float32
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(FINITE_FLOATS, min_size=1, max_size=16))
def test_quantize_bound_holds_on_arbitrary_vectors(spark, vec):
    """For ANY finite float32 vector: codes stay in [-127, 127] with
    no clamp, and every reconstructed element is within scale/2 of
    the original (+ tiny fp slack for the division round-trip)."""
    from irio2024_mapreduce_spark.operators.similarity import (
        QUANT_LEVELS,
        quantize_vectors,
    )

    df = spark.createDataFrame(
        [(0, vec, 0)], "vec_id long, embedding array<float>, label int"
    )
    r = quantize_vectors(df).collect()[0]
    s, codes = r["scale"], r["codes"]
    # float32 storage rounds the inputs — compare against what Spark read
    stored = [float(v) for v in df.collect()[0]["embedding"]]
    assert len(codes) == len(stored)
    for xi, ci in zip(stored, codes):
        assert -QUANT_LEVELS <= ci <= QUANT_LEVELS
        assert abs(xi - ci * s) <= s / 2 + 1e-9 * max(1.0, abs(xi))
    if max(abs(v) for v in stored) == 0:
        assert s == 0 and all(c == 0 for c in codes)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(
                alphabet=st.sampled_from(list("enfrdezh") + ["é", "東"]),
                min_size=0,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_split_matches_python_spec_on_arbitrary_ids(spark, rows):
    """The split tag is a pure function of (doc_id, lang) — for ANY
    int64 id (negative included) and ANY unicode lang string, Spark
    must agree with the pure-Python md5 spec."""
    import hashlib

    from irio2024_mapreduce_spark.operators.llm_prep import (
        SPLIT_TEST_HEX,
        SPLIT_TEST_HEX_EN,
        SPLIT_VAL_HEX,
        SPLIT_VAL_HEX_EN,
        split_docs,
    )

    def expect(doc_id, lang):
        key = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        t = SPLIT_TEST_HEX_EN if lang == "en" else SPLIT_TEST_HEX
        v = SPLIT_VAL_HEX_EN if lang == "en" else SPLIT_VAL_HEX
        return "test" if key < t else ("val" if key < v else "train")

    df = spark.createDataFrame(
        [(i, lang) for i, lang in rows], "doc_id long, lang string"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in split_docs(df).select("doc_id", "split").collect()
    }
    assert got == {i: expect(i, lang) for i, lang in rows}
