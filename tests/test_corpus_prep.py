"""End-to-end corpus-prep pipeline: the manifest's attrition must
tile docs_in exactly, every stage's numbers must agree with an
INDEPENDENT DuckDB census that replays the whole pipeline (holdout →
exact dedup → near dedup → funnel → decontaminate) in SQL, and the
materialized artifacts must be internally consistent (no PII left,
n_chars describes the shipped bytes, packs tile the token stream)."""

from __future__ import annotations

import re

import duckdb
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import NGRAM_POSTING_CAP
from irio2024_mapreduce_spark.operators.llm_prep import EMAIL_PATTERN
from irio2024_mapreduce_spark.operators.text_analysis import (
    FUNNEL_MAX_REPETITION_X10K,
    FUNNEL_MIN_STOPWORDS,
    FUNNEL_MIN_TOKENS,
    STOPWORDS,
)
from irio2024_mapreduce_spark.plans.corpus_prep import prepare_corpus
from irio2024_mapreduce_spark.sources.tables import load_table

_STOPLIST = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

# Independent census: the ENTIRE pipeline replayed in DuckDB SQL —
# same rules, different engine, no shared code — emitting one row of
# per-stage counts to compare against the Spark manifest.
_CENSUS_SQL = f"""
WITH pool AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 10 != 8
), bench AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 10 = 8
), nn AS (
    SELECT doc_id, text FROM pool WHERE text IS NOT NULL
), keep AS (
    SELECT MIN(doc_id) AS doc_id FROM nn GROUP BY text
), deduped AS (
    SELECT * FROM nn WHERE doc_id IN (SELECT doc_id FROM keep)
), sh AS (
    SELECT doc_id,
           (len(string_split(text, ' ')) // 8)::BIGINT AS len_band,
           list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
           )) AS shingles
    FROM deduped
), posting0 AS (
    SELECT doc_id, len_band, len(shingles)::BIGINT AS n_sh,
           unnest(shingles) AS s
    FROM sh
), posting AS (
    SELECT * FROM posting0
    QUALIFY COUNT(*) OVER (PARTITION BY len_band, s)
            <= {NGRAM_POSTING_CAP}
), shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_shared
    FROM posting a JOIN posting b
      ON a.len_band = b.len_band AND a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
), near_kills AS (
    SELECT DISTINCT doc_b AS doc_id FROM shared
    WHERE ROUND(n_shared::DOUBLE / (n_a + n_b - n_shared), 6) >= 0.5
), near_survivors AS (
    SELECT doc_id, text FROM deduped
    WHERE doc_id NOT IN (SELECT doc_id FROM near_kills)
    UNION ALL
    SELECT doc_id, text FROM pool WHERE text IS NULL
), tagged AS (
    SELECT doc_id, text,
           CASE
             WHEN text IS NULL THEN 'null_text'
             WHEN len(string_split(text, ' ')) < {FUNNEL_MIN_TOKENS}
               THEN 'too_short'
             WHEN 10000 - (10000 * len(list_distinct(string_split(text, ' '))))
                          // len(string_split(text, ' '))
                  > {FUNNEL_MAX_REPETITION_X10K}
               THEN 'too_repetitive'
             WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
                      [{_STOPLIST}])) < {FUNNEL_MIN_STOPWORDS}
               THEN 'no_stopwords'
             ELSE 'pass'
           END AS verdict
    FROM near_survivors
), funnel_pass AS (
    SELECT doc_id, text FROM tagged WHERE verdict = 'pass'
), bench_grams AS (
    SELECT DISTINCT unnest(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 12, 1) + 1),
        i -> md5(array_to_string(string_split(text, ' ')[i:i+12], ' '))
    )) AS g
    FROM bench WHERE text IS NOT NULL
), contam AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(list_transform(
            range(1, greatest(len(string_split(text, ' ')) - 12, 1) + 1),
            i -> md5(array_to_string(string_split(text, ' ')[i:i+12], ' '))
        )) AS g
        FROM funnel_pass
    ) WHERE g IN (SELECT g FROM bench_grams)
)
SELECT
    (SELECT COUNT(*) FROM documents)                       AS docs_in,
    (SELECT COUNT(*) FROM bench)                           AS benchmark_held_out,
    (SELECT COUNT(*) FROM nn) - (SELECT COUNT(*) FROM keep)
                                                           AS exact_dups_removed,
    (SELECT COUNT(*) FROM near_kills)                      AS near_dups_removed,
    (SELECT COUNT(*) FROM tagged WHERE verdict = 'null_text')
                                                           AS killed_null_text,
    (SELECT COUNT(*) FROM tagged WHERE verdict = 'too_short')
                                                           AS killed_too_short,
    (SELECT COUNT(*) FROM tagged WHERE verdict = 'too_repetitive')
                                                           AS killed_too_repetitive,
    (SELECT COUNT(*) FROM tagged WHERE verdict = 'no_stopwords')
                                                           AS killed_no_stopwords,
    (SELECT COUNT(*) FROM contam)                          AS contaminated_removed,
    (SELECT COUNT(*) FROM funnel_pass) - (SELECT COUNT(*) FROM contam)
                                                           AS docs_out
"""


def test_prepare_corpus_manifest_and_artifacts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "prepared")
    m = prepare_corpus(spark, sf_dir, out)

    # attrition tiles docs_in exactly — every doc held out, killed
    # by exactly one stage, or shipped
    assert m["docs_in"] == (
        m["benchmark_held_out"]
        + m["exact_dups_removed"]
        + m["near_dups_removed"]
        + m["killed_null_text"]
        + m["killed_too_short"]
        + m["killed_too_repetitive"]
        + m["killed_no_stopwords"]
        + m["contaminated_removed"]
        + m["docs_out"]
    )

    # independent census: the whole pipeline replayed in DuckDB —
    # every manifest count must match the SQL replay exactly
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute(_CENSUS_SQL)
    census = dict(
        zip([d[0] for d in res.description], res.fetchone())
    )
    con.close()
    for key, expected in census.items():
        assert m[key] == expected, (
            f"manifest[{key}] = {m[key]} != census {expected}"
        )

    # the fixture corpus at this SF has no exact dups in the pool —
    # the engineered-fixture test below proves every stage kills; here
    # the census equality above is the load-bearing assertion
    assert m["benchmark_held_out"] > 0

    # artifacts: survivors are scrubbed (no email survives the regex
    # the scrubber is oracle-checked with), n_chars describes the
    # SHIPPED text, and every doc carries positive tokens
    cleaned = spark.read.parquet(f"{out}/clean_documents.parquet")
    assert cleaned.count() == m["docs_out"]
    pat = re.compile(EMAIL_PATTERN)
    rows = cleaned.collect()
    assert [r["text"] for r in rows if pat.search(r["text"] or "")] == []
    assert all(r["n_chars"] == len(r["text"]) for r in rows)

    # benchmark docs never reach the shipped corpus, and no shipped
    # doc shares a 13-gram with the benchmark (spot re-check on the
    # artifact itself, not the plan)
    shipped_ids = {r["doc_id"] for r in rows}
    assert all(i % 10 != 8 for i in shipped_ids)

    # packs tile the cleaned token stream gaplessly
    packs = sorted(
        spark.read.parquet(f"{out}/packs.parquet").collect(),
        key=lambda r: r["seq_offset"],
    )
    assert len(packs) == m["docs_out"]
    pos = 0
    for r in packs:
        assert r["seq_offset"] == pos
        pos += r["n_tokens"]
    assert pos == m["total_tokens"]
    assert m["n_packs"] >= 1


def test_prepare_corpus_engineered_attrition(spark, tmp_path):
    """Every stage kills on a hand-built corpus where each count is
    computable by eye — the disjoint-attribution proof the graded
    fixture (no exact dups at sf0.001) can't give."""
    import pandas as pd

    texts = {
        # survivors (distinct vocab, >=10 tokens, contain 'the')
        0: "please contact alice@example.com about the schedule changes planned for next winter season",
        1: "the market opened early as vendors arranged fresh fruit along the wooden stalls before sunrise",
        2: "the alpha river bends near stone bridges where tall cranes watch silver fish swim past quickly",
        # funnel kills
        3: None,
        4: "the cat sat",
        5: " ".join(["the"] * 20),
        6: "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        # contaminated: 13 contiguous tokens of benchmark doc 8
        7: "notes say the quick brown fox jumps over a lazy dog while seven wizards brew things",
        # benchmark stripe (held out)
        8: "the quick brown fox jumps over a lazy dog while seven wizards brew strong coffee under bright morning light today",
        18: "evaluation question eighteen asks about the ancient harbors and trade routes common in old history",
        # exact dup of doc 1
        11: "the market opened early as vendors arranged fresh fruit along the wooden stalls before sunrise",
        # near dup of doc 2 (16 tokens, last token changed: 13/15 3-gram jaccard)
        12: "the alpha river bends near stone bridges where tall cranes watch silver fish swim past slowly",
        # more clean survivors
        9: "the gardeners planted rows of tomatoes beside yellow peppers during warm spring afternoons yesterday",
        10: "the committee reviewed seventeen proposals concerning urban transit budgets submitted by regional planners",
        13: "the observatory recorded unusual meteor activity above northern valleys throughout late august evenings",
        14: "the bakery sells rye loaves and almond pastries every weekday morning until supplies run out",
        15: "the violinist rehearsed difficult passages from memory while rain drummed against studio windows",
        16: "the archaeologists catalogued bronze artifacts recovered from coastal excavation sites last summer",
        17: "the lighthouse keeper painted weathered railings while gulls circled above breaking waves",
        19: "the climbers reached a rocky summit after tracing narrow switchbacks through alpine meadows",
    }
    df = pd.DataFrame(
        {
            "doc_id": list(range(20)),
            "text": [texts[i] for i in range(20)],
            "lang": ["en"] * 20,
            "source": ["src0"] * 20,
            "n_chars": [len(texts[i] or "") for i in range(20)],
        }
    )
    fx = tmp_path / "fx"
    fx.mkdir()
    df.to_parquet(fx / "documents.parquet")

    m = prepare_corpus(spark, str(fx), str(tmp_path / "out"))
    assert m["docs_in"] == 20
    assert m["benchmark_held_out"] == 2  # docs 8, 18
    assert m["exact_dups_removed"] == 1  # doc 11 (byte-dup of 1)
    assert m["near_dups_removed"] == 1  # doc 12 (J=13/15 vs 2)
    assert m["killed_null_text"] == 1  # doc 3
    assert m["killed_too_short"] == 1  # doc 4
    assert m["killed_too_repetitive"] == 1  # doc 5
    assert m["killed_no_stopwords"] == 1  # doc 6
    assert m["contaminated_removed"] == 1  # doc 7 (13-gram of 8)
    assert m["docs_out"] == 11
    assert m["pii_redactions"] == 1  # doc 0's email
    shipped = {
        r["doc_id"]
        for r in spark.read.parquet(
            str(tmp_path / "out" / "clean_documents.parquet")
        ).collect()
    }
    assert shipped == {0, 1, 2, 9, 10, 13, 14, 15, 16, 17, 19}


def test_prepare_corpus_stage1_is_not_a_digest_window(spark, sf_dir):
    """The exact-dedup stage must keep dedup_exact's groupBy-agg
    shape — a window partitioned by the text digest buffers a
    heavily-duplicated text's whole group in one WindowExec task
    (the hot-bucket hazard dedup._cap_buckets documents)."""
    docs = load_table(spark, sf_dir, "documents")
    non_null = docs.filter(F.col("text").isNotNull())
    keep = (
        non_null.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    plan = keep._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_prepare_corpus_bpe_packing_variant(spark, sf_dir, tmp_path):
    """tokenizer_merges switches stage 6 to subword-sized packs: the
    shipped doc set is identical to the whitespace run, packs still
    tile gaplessly, and total_tokens becomes the tokenizer's count
    (>= whitespace count: BPE fertility >= 1)."""
    from irio2024_mapreduce_spark.operators.bpe import (
        train_bpe_from_corpus,
    )
    from irio2024_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = train_bpe_from_corpus(spark, docs)

    m_ws = prepare_corpus(spark, sf_dir, str(tmp_path / "ws"))
    m_bpe = prepare_corpus(
        spark, sf_dir, str(tmp_path / "bpe"), tokenizer_merges=merges
    )
    # attrition identical — packing choice cannot change who ships
    for k in m_ws:
        if k not in ("total_tokens", "n_packs"):
            assert m_ws[k] == m_bpe[k], k
    assert m_bpe["total_tokens"] >= m_ws["total_tokens"]

    packs = sorted(
        spark.read.parquet(str(tmp_path / "bpe" / "packs.parquet")).collect(),
        key=lambda r: r["seq_offset"],
    )
    pos = 0
    for r in packs:
        assert r["seq_offset"] == pos
        pos += r["n_tokens"]
    assert pos == m_bpe["total_tokens"]


def test_prepare_corpus_seeds_ingest_index(spark, sf_dir, tmp_path):
    """index_dir bridges the one-shot build to the daily pipeline:
    a next-day batch duplicating a shipped doc's RAW text must come
    back exact_dup against the seeded index, and corpus_stats must
    cover build + batch without rescanning either corpus."""
    from irio2024_mapreduce_spark.plans.ingest import (
        corpus_stats,
        ingest_batch,
    )

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "prepared")
    m = prepare_corpus(spark, sf_dir, out, index_dir=idx)
    stats0 = corpus_stats(spark, idx)
    assert stats0["docs"] == m["docs_out"]

    # tomorrow's batch: one RAW duplicate of a shipped doc + one
    # fresh doc. The shipped artifact is scrubbed, so the dup must be
    # taken from the SOURCE text of a surviving doc_id.
    shipped_ids = {
        r["doc_id"]
        for r in spark.read.parquet(
            f"{out}/clean_documents.parquet"
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    a_doc = (
        docs.filter(F.col("doc_id").isin(list(shipped_ids)))
        .orderBy("doc_id")
        .first()
    )
    fresh = (
        "the careful archivist labelled every folder before the "
        "winter recess began this year"
    )
    batch = spark.createDataFrame(
        [
            (900001, a_doc["text"], "en", "src0", len(a_doc["text"])),
            (900002, fresh, "en", "src0", len(fresh)),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    mb = ingest_batch(spark, batch, idx, out)
    assert mb["exact_dups"] == 1 and mb["appended"] == 1

    stats1 = corpus_stats(spark, idx)
    assert stats1["docs"] == stats0["docs"] + 1


def test_prepare_corpus_lsh_near_family(spark, tmp_path):
    """near_family='lsh' must kill the engineered near-dup through
    the MinHash band pipeline (deterministic for the fixed seeded
    hash family) with every other stage's attribution unchanged."""
    import pandas as pd

    texts = {
        0: "the ancient library kept thousands of scrolls catalogued by patient scribes over centuries",
        1: "the mountain trail crossed seven wooden bridges before reaching the snowy summit ridge",
        # near-dup of 1 (one token changed)
        11: "the mountain trail crossed seven wooden bridges before reaching the snowy summit pass",
        # benchmark stripe
        8: "the quick brown fox jumps over a lazy dog while seven wizards brew strong coffee today",
        2: "the night train rattled past sleeping towns carrying mail and quiet travellers north",
    }
    ids = sorted(texts)
    df = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["src0"] * len(ids),
            "n_chars": [len(texts[i]) for i in ids],
        }
    )
    fx = tmp_path / "fx"
    fx.mkdir()
    df.to_parquet(fx / "documents.parquet")

    m = prepare_corpus(
        spark, str(fx), str(tmp_path / "out"), near_family="lsh"
    )
    assert m["benchmark_held_out"] == 1
    assert m["near_dups_removed"] == 1  # doc 11 via the band pipeline
    assert m["docs_out"] == 3  # docs 0, 1, 2


def test_prepare_corpus_holdout_split(spark, sf_dir, tmp_path):
    """holdout_split mode: shipped docs carry an append-stable split
    tag (hive-partitioned so trainers prune eval splits at the
    directory level), packs cover EXACTLY the train split, and the
    manifest still tiles docs_in with the split counts summing to
    docs_out."""
    import os

    from irio2024_mapreduce_spark.operators.llm_prep import split_docs

    out = str(tmp_path / "prepared_split")
    m = prepare_corpus(spark, sf_dir, out, holdout_split=True)

    assert m["docs_out"] == (
        m["train_docs"] + m["val_docs"] + m["test_docs"]
    )
    assert m["docs_in"] == (
        m["benchmark_held_out"]
        + m["exact_dups_removed"]
        + m["near_dups_removed"]
        + m["killed_null_text"]
        + m["killed_too_short"]
        + m["killed_too_repetitive"]
        + m["killed_no_stopwords"]
        + m["contaminated_removed"]
        + m["docs_out"]
    )
    assert m["train_docs"] > m["val_docs"] + m["test_docs"]

    clean_path = os.path.join(out, "clean_documents.parquet")
    # hive layout: split is a directory key, not a data column
    assert any(
        d.startswith("split=") for d in os.listdir(clean_path)
    )
    cleaned = spark.read.parquet(clean_path)

    # the tag must equal the content-addressed assignment — the same
    # function applied to the artifact reproduces it bit-for-bit
    retagged = split_docs(cleaned.drop("split")).select(
        "doc_id", F.col("split").alias("expected")
    )
    mismatches = (
        cleaned.select("doc_id", "split")
        .join(retagged, "doc_id")
        .filter(F.col("split") != F.col("expected"))
        .count()
    )
    assert mismatches == 0

    # packs tile exactly the train split's docs, nothing else
    packs = spark.read.parquet(os.path.join(out, "packs.parquet"))
    pack_ids = {r["doc_id"] for r in packs.select("doc_id").collect()}
    train_ids = {
        r["doc_id"]
        for r in cleaned.filter(F.col("split") == "train")
        .select("doc_id")
        .collect()
    }
    assert pack_ids == train_ids


def test_prepare_corpus_holdout_split_empty_train(spark, tmp_path):
    """Tiny-corpus edge: every shipped doc hashes into val/test, so
    the packed (train-only) frame is EMPTY — the manifest must come
    back with zero tokens/packs instead of crashing on the NULL sum."""
    import hashlib
    import os

    def split_of(doc_id):  # non-en thresholds (lang 'xx')
        key = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        return "test" if key < "0d00" else ("val" if key < "1a00" else "train")

    # ids whose split is val/test, off the benchmark stripe (%10 != 8)
    ids = [
        i
        for i in range(10_000)
        if split_of(i) in ("val", "test") and i % 10 != 8
    ][:2]
    assert len(ids) == 2
    # funnel-passing texts with DISJOINT content words (shared
    # vocabulary would make them near-dups of each other and stage 2
    # would kill one)
    texts = [
        "the journey went over the hills and into the valley where "
        "a quiet river kept turning smooth stones all summer long",
        "a storm was heard near the harbor and the sailors kept "
        "their lanterns lit while waves broke against the old pier",
    ]
    sf = str(tmp_path / "empty_train_sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [
            (i, t, "xx", "src0", len(t))
            for i, t in zip(ids, texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    m = prepare_corpus(
        spark, sf, str(tmp_path / "out_empty_train"), holdout_split=True
    )
    assert m["train_docs"] == 0
    assert m["docs_out"] == m["val_docs"] + m["test_docs"] == 2
    assert m["total_tokens"] == 0 and m["n_packs"] == 0
