"""BPE tokenizer checks: hand-computed merges on the textbook
corpus, encode/merge-order semantics, lossless round-trip as a
hypothesis property, and the Spark train→apply report's internal
consistency (no DuckDB oracle — BPE's iterative merge loop is not
SQL-expressible; this suite is the declared check)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from irio2024_mapreduce_spark.operators.bpe import (
    bpe_apply,
    bpe_encode,
    bpe_tokenize,
    train_bpe,
    train_bpe_from_corpus,
)


def test_train_bpe_textbook_corpus():
    """Sennrich et al.'s worked example: es→est dominate, then the
    l-o of low/lower. Tie-breaks are lexicographic, so the table is
    reproducible by hand."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(counts, 4)
    # (e,s): 9, then (es,t): 9, then (l,o): 7, then (lo,w): 7
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_train_bpe_deterministic_tiebreak():
    # every adjacent pair occurs once → lexicographically smallest
    # pair wins each round regardless of input order
    assert train_bpe([("ba", 1), ("ab", 1)], 1) == train_bpe(
        [("ab", 1), ("ba", 1)], 1
    )
    assert train_bpe([("ab", 1), ("ba", 1)], 1) == [("a", "b")]


def test_encode_applies_lowest_rank_first_and_all_occurrences():
    ranks = {("a", "b"): 0, ("ab", "ab"): 1, ("b", "a"): 2}
    # rank 0 merges BOTH "ab"s (left-to-right, non-overlapping),
    # then rank 1 joins them — rank 2 never fires
    assert bpe_encode("abab", ranks) == ["abab"]
    assert bpe_encode("aba", ranks) == ["ab", "a"]
    assert bpe_encode("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode("", ranks) == []


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters=" "),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=20,
    ),
    probe=st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters=" "),
        max_size=24,
    ),
)
def test_encode_round_trips_any_string_under_any_table(words, probe):
    """Lossless property: for a merge table trained on ANY corpus,
    encoding ANY string (in- or out-of-vocabulary) concatenates back
    to the original."""
    merges = train_bpe([(w, 1) for w in words], 32)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in [*words, probe]:
        assert "".join(bpe_encode(w, ranks)) == w


def test_spark_train_apply_consistency(spark, sf_dir):
    """End-to-end on the fixture corpus: the distributed trainer's
    merge table matches a pure-Python train over the same counts, the
    applied counts bound correctly (words ≤ subwords ≤ chars), and
    in-vocab words actually compress (fewer subwords than chars)."""
    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = train_bpe_from_corpus(spark, docs)
    # parity: pure-Python training on the exact same (word, count)
    # input reproduces the distributed pipeline's table
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    py_counts = sorted(
        [(r["w"], r["count"]) for r in counts],
        key=lambda wc: (-wc[1], wc[0]),
    )[:4096]
    assert merges == train_bpe(py_counts)

    per_doc = bpe_apply(docs, merges).collect()
    assert per_doc
    for r in per_doc:
        assert r["ws_tokens"] <= r["subword_tokens"] <= r["chars"]

    rep = {r["source"]: r.asDict() for r in bpe_tokenize(spark, sf_dir).collect()}
    assert rep
    for row in rep.values():
        # fertility ≥ 1 word⁻¹ by the bound above; a trained table on
        # this repetitive fixture must actually merge: strictly fewer
        # subwords than characters-less-spaces
        assert row["fertility_x10k"] >= 10_000
        assert row["chars_per_subword_x10k"] > 10_000


def test_encode_long_word_segments_and_round_trips():
    """A pathological no-space blob must not trigger the quadratic
    merge loop on its full length: it encodes per 64-char segment
    (bounded work) and still concatenates back exactly."""
    from irio2024_mapreduce_spark.operators.bpe import BPE_MAX_WORD_CHARS

    ranks = {("a", "b"): 0, ("ab", "ab"): 1}
    blob = "ab" * 5000  # 10k chars
    pieces = bpe_encode(blob, ranks)
    assert "".join(pieces) == blob
    # segment isolation: no piece spans a segment boundary
    assert all(len(p) <= BPE_MAX_WORD_CHARS for p in pieces)
    # inside each 64-char segment the merges still fire fully: 32
    # chars of "ab" collapse rank-0 then rank-1 into "abab" tokens
    assert pieces[0] == "abab"
    assert set(pieces) == {"abab"}


def test_pack_docs_bpe_tiling_parity_and_plan(spark, sf_dir):
    """BPE-aware packing (r8): gapless tiling under SUBWORD counts,
    identical doc order to the whitespace variant (same
    content-addressed layout key), and the pinned two-phase-scan
    shape surviving the Arrow-stage composition."""
    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.operators.llm_prep import (
        PACK_MAX_TOKENS,
        pack_docs,
        pack_docs_bpe,
    )
    from irio2024_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = train_bpe_from_corpus(spark, docs)
    bpe_rows = sorted(
        pack_docs_bpe(spark, docs, merges).collect(),
        key=lambda r: r["seq_offset"],
    )
    assert bpe_rows

    # gapless tiling under subword counts; boundary flags consistent
    pos = 0
    for r in bpe_rows:
        assert r["seq_offset"] == pos
        assert r["pack_id"] == pos // PACK_MAX_TOKENS
        assert r["spans_boundary"] == int(
            pos // PACK_MAX_TOKENS
            != (pos + r["n_tokens"] - 1) // PACK_MAX_TOKENS
        )
        pos += r["n_tokens"]

    # totals equal the Arrow stage's own counts — packing must not
    # invent or drop a subword
    per_doc = {
        r["doc_id"]: r["subword_tokens"]
        for r in bpe_apply(docs, merges).collect()
    }
    assert pos == sum(per_doc.values())
    assert all(r["n_tokens"] == per_doc[r["doc_id"]] for r in bpe_rows)

    # doc ORDER parity with the whitespace variant: same md5(doc_id)
    # layout key, so only offsets/boundaries may differ
    ws_rows = sorted(
        pack_docs(spark, docs).collect(), key=lambda r: r["seq_offset"]
    )
    assert [r["doc_id"] for r in ws_rows] == [
        r["doc_id"] for r in bpe_rows
    ]

    # plan pin: the composed plan keeps the distributed scan shape —
    # range partitioning + broadcast offsets join, no whole-corpus
    # SinglePartition exchange beyond the bounded offsets branch
    plan = (
        pack_docs_bpe(spark, docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert plan.count("SinglePartition") <= 1
    assert "MapInPandas" in plan  # the Arrow count stage is in-plan
