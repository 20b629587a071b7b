"""Document chunking + near-dup clustering — the last mile of a
training-data pipeline (docs → dedup clusters → canonical docs →
overlapping context-window chunks).

``doc_chunk`` is a pure plan (explode over window starts + slice) —
map-only, linear, oracle-checked. ``dedup_clusters`` is the
iterative-algorithm representative: connected components over the
near-dup pair graph via smallest-label propagation — each iteration
is one join + aggregate, state stays distributed. Bounded
iterations; deterministic. Its edge set is the ORACLE-CHECKED
``dedup_ngram_jaccard`` pair set (plus exact-duplicate edges), which
makes the whole query hash-checkable: DuckDB reproduces the same
edges and closes them with a recursive CTE. (``dedup_near``'s
seeded-MinHash edges would force a rows-only check — same clustering
code, unverifiable edge generator.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio2024_mapreduce_spark.operators.dedup import (
    ORACLE_SQL as _DEDUP_ORACLE_SQL,
    dedup_ngram_jaccard,
)
from irio2024_mapreduce_spark.sources.tables import (
    load_table,
    load_table_parallel,
)

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping token windows (context-window
    shaping for LLM training). Windows start every CHUNK_STRIDE
    tokens; the tail window may be short but is never empty."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    # window start indexes: 1, 1+stride, ... while start <= n
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - 1, F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            toks.alias("toks"),
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            "lang",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice("toks", F.col("start"), CHUNK_TOKENS)
            ).alias("chunk_text"),
            F.least(
                F.size("toks") - F.col("start") + 1, F.lit(CHUNK_TOKENS)
            ).cast("long").alias("n_tokens"),
        )
    )


BOILERPLATE_MIN_DOCS = 2


def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: token-window chunks that recur
    across >= BOILERPLATE_MIN_DOCS distinct documents (navigation
    bars, license footers, templated paragraphs — the content a
    pretraining pipeline strips because the model would otherwise
    memorize it at its duplication count, not its information value).

    Scale shape: the chunks stream (doc_chunk, map-only 1->N) feeds a
    groupBy on md5(chunk_text) — the shuffle carries the 16-byte
    digest + counters, never chunk bodies, and partial aggregation
    collapses each partition's repeats map-side. Output is the
    boilerplate REGISTRY (one row per offending chunk hash); the
    removal pass is a broadcast anti-join of that registry against
    the chunk stream at write time."""
    chunks = doc_chunk(spark, sf_dir)
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_md5"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


MAX_CC_ITERATIONS = 10

# Probe-only toggle (tools/stress_cc_ivf.py): True (default) runs
# connected components on the COLLAPSED exact-dup representative
# graph (round-5 form — the label loop never sees duplicate members);
# False runs the legacy member-graph propagation for A/B comparison.
# The result is IDENTICAL either way — only the rows the loop touches
# differ.
CC_REP_SEEDING = True

# observability: rounds the last dedup_clusters call needed (includes
# the final no-change confirmation round) — read by tests/probes, never
# by query logic
_LAST_CC_ROUNDS = 0


def _ckpt_rdd(df: DataFrame):
    """Underlying JVM RDD of a ``localCheckpoint(eager=False)`` frame
    (its logical plan is a LogicalRDD from creation, before any job
    runs). Held so the CC loop can free a round's blocks the moment a
    later round's materialization makes them dead — local-checkpoint
    blocks otherwise persist until the JVM collects the py4j refs,
    and loaded bench runs showed 9-12 live block sets by late rounds
    (the recurring dedup_clusters transient)."""
    return df._jdf.queryExecution().logical().rdd()


def _doc_rep(docs_raw: DataFrame) -> DataFrame:
    """doc_id → exact-dup representative (min doc_id per sha2(text))
    for the whole corpus — the attachment that maps every member onto
    the collapsed rep graph's labels. Factored out as the seam the
    r15 A/B (tools/ab_r15_ccdocrep.py) swaps shapes through.

    Shape: the 32-byte (doc_id, hash) rows are materialized once
    (lazy checkpoint) because `reps` and the doc→rep join are two
    consumers of the scan+sha2 pass, which would otherwise run twice
    (corpus-sized at scale)."""
    hashed = docs_raw.select(
        "doc_id", F.sha2("text", 256).alias("_h")
    ).localCheckpoint(eager=False)
    reps = hashed.groupBy("_h").agg(F.min("doc_id").alias("rep"))
    return hashed.join(reps, "_h").select("doc_id", "rep")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-dup pairs → canonical doc per
    cluster + cluster size. Smallest-label propagation with pointer
    jumping; fixpoint = components.

    **Collapsed-graph CC (round-5 form, CC_REP_SEEDING=True):** the
    propagation runs on the exact-dup REPRESENTATIVE graph only. The
    near-dup edge source (``dedup_ngram_jaccard``) already collapses
    byte-identical texts and emits pairs between representatives, so
    every exact d-clique is ONE node in the graph — at a 100×
    replicated corpus the label loop touches ~1/100th of the rows the
    member-graph form did (measured 43 s → see SCALE.md), and exact
    duplicates receive their cluster label afterwards through one
    doc→rep→label join. The fixpoint is identical: a component's
    label is the min rep id, and the min rep id IS the min doc id of
    the whole member set (each rep is its clique's min).

    Each iteration is a shuffle-bounded join (edges ⋈ labels) — no
    driver-side graph. Iterations are bounded by near-component
    DIAMETER (small by construction), not corpus size.

    Edges come from the oracle-checked ``dedup_ngram_jaccard`` pair
    set so the component structure is hash-verifiable end-to-end (the
    DuckDB oracle rebuilds the identical edges and takes their
    transitive closure with a recursive CTE).

    ``CC_REP_SEEDING=False`` (probe-only baseline) runs the legacy
    member-graph propagation: every doc is a node, exact cliques are
    rep↔dup star edges, everyone self-labels.
    """
    near_pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    docs_raw = load_table(spark, sf_dir, "documents")
    doc_rep = _doc_rep(docs_raw)

    if CC_REP_SEEDING:
        pairs = near_pairs
    else:
        # legacy member graph: rep↔duplicate star edges pull exact
        # twins into the propagation itself
        exact_pairs = doc_rep.filter(
            F.col("doc_id") != F.col("rep")
        ).select(
            F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
        pairs = near_pairs.unionByName(exact_pairs)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
    )
    # localCheckpoint: materialize once and TRUNCATE LINEAGE — without
    # it every iteration's action re-derives the near-dup pair graph
    # from scratch and the label plan doubles per round (the classic
    # iterative-DataFrame blowup). Lazy: the first convergence count
    # triggers it, folding edge materialization into iteration 1's job.
    edges = edges.localCheckpoint(eager=False)
    members = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = members.select("doc_id", F.col("doc_id").alias("label"))

    global _LAST_CC_ROUNDS
    converged = False
    # block bookkeeping: `stale_half` is the previous round's `half`
    # checkpoint (consumed once this round's convergence count
    # materializes the labels built from it); `labels_ckpt` is the
    # current labels frame's checkpoint (consumed once this round's
    # `half` materializes) — freed eagerly instead of holding 2 block
    # sets per round until the JVM collects the py4j references (the
    # dedup_clusters bench transient).
    stale_half = None
    labels_ckpt = None
    for _round in range(MAX_CC_ITERATIONS):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("neighbor_label"))
        )
        # carry the pre-round label through as _old: the convergence
        # check then is a FILTER on the round's own output instead of
        # a corpus-sized join against the previous labels frame
        half = (
            labels.join(
                neighbor_min, labels.doc_id == neighbor_min.src, "left"
            )
            .select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("neighbor_label", F.col("label"))
                ).alias("label"),
            )
            # materialize ONCE before the convergence count and the
            # jump self-join below — both jump sides would otherwise
            # instantiate the whole edges⋈labels⋈agg subtree as
            # separate plans (the classic self-join double-subtree);
            # lazy, so the count is still the round's single action
            .localCheckpoint(eager=False)
        )
        # convergence check on the PROPAGATION half (r14 opt): the
        # propagation fixpoint (no label has a smaller closed-
        # neighborhood min) IS the component fixpoint — by induction
        # from each component-min node m (label(m) = m always, its
        # neighbors' fixpoint labels equal m, and so on outward), so
        # no-change-here equals the old post-jump no-change check,
        # round for round (the jump only lowers labels a propagation
        # already moved: half.label changed ⇒ new_labels.label
        # changed, and an unchanged half makes the jump the
        # identity). Checking BEFORE the jump skips the final
        # round's jump join + checkpoint — computed work the old
        # shape always threw away (guide §1.2: don't compute what
        # you discard).
        changed = (
            half.filter(F.col("label") != F.col("_old")).limit(1).count()
        )
        # the count's job materializes `half` (and, by lazy-checkpoint
        # cascade, the previous round's labels it reads), so the
        # previous round's `half` blocks are now dead
        if stale_half is not None:
            stale_half.unpersist(False)
            stale_half = None
        if changed == 0:
            converged = True
            _LAST_CC_ROUNDS = _round + 1
            # half's content equals labels' (no row changed): the
            # post-loop plan keeps reading `labels`, so half's fresh
            # blocks are immediately dead
            _ckpt_rdd(half).unpersist(False)
            if CC_REP_SEEDING and _round > 0:
                # the edge graph is dead once labels' lineage is
                # truncated: the rep-seeding post-loop plan reads only
                # labels + doc_rep (whose `hashed` checkpoint
                # materializes at the final action and must stay). The
                # legacy path still reads `members` — derived from
                # edges — in its singleton anti-join, so edges must
                # survive there. Round-0 convergence (empty/trivial
                # near-dup graph) must ALSO keep edges: `labels` is
                # then still the un-checkpointed members-derived frame
                # whose lineage reads the edge blocks — freeing them
                # would force the whole pair-generation subtree to
                # recompute at the final action (ADVICE r14).
                _ckpt_rdd(edges).unpersist(False)
            break
        # this round moved labels: the previous labels blocks have no
        # further consumer (the jump below reads only `half`)
        if labels_ckpt is not None:
            labels_ckpt.unpersist(False)
        # pointer-jumping (label ← label's label): halves the distance
        # to the component minimum each round, so convergence is
        # O(log diameter) instead of O(diameter) — a 10-round budget
        # then covers ~2^10-long near-dup chains
        jump = half.select(
            F.col("doc_id").alias("jdoc"), F.col("label").alias("jlabel")
        )
        new_labels = (
            half.join(jump, half.label == jump.jdoc, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("jlabel", F.col("label"))
                ).alias("label"),
            )
            # lazy checkpoint: the NEXT round's convergence count (or
            # the post-loop action) is the materializing job
            .localCheckpoint(eager=False)
        )
        stale_half = _ckpt_rdd(half)
        labels_ckpt = _ckpt_rdd(new_labels)
        labels = new_labels.select("doc_id", "label")
    if not converged:
        raise RuntimeError(
            "dedup_clusters: label propagation did not converge in "
            f"{MAX_CC_ITERATIONS} iterations — component diameter exceeds "
            "2^iterations; raise MAX_CC_ITERATIONS"
        )

    if CC_REP_SEEDING:
        # attach every doc to its rep's component label; a rep outside
        # the near graph labels its clique by itself. This is the ONLY
        # corpus-sized step after the (tiny) rep-graph propagation.
        rep_labels = labels.select(
            F.col("doc_id").alias("rep"), "label"
        )
        doc_labels = doc_rep.join(rep_labels, "rep", "left").select(
            "doc_id", F.coalesce("label", F.col("rep")).alias("label")
        )
        per_cluster = doc_labels.groupBy("label").agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc"),
        )
    else:
        clusters = labels.groupBy("label").agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc"),
        )
        # include singleton docs (no edges at all) for the full picture
        all_docs = load_table(spark, sf_dir, "documents").select("doc_id")
        singletons = all_docs.join(members, "doc_id", "left_anti").select(
            F.col("doc_id").alias("label"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.col("doc_id").alias("canonical_doc"),
        )
        per_cluster = clusters.select(
            "label", "cluster_size", "canonical_doc"
        ).unionByName(singletons)
    return (
        per_cluster.select(
            F.col("canonical_doc"),
            F.col("cluster_size"),
        )
        .groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            F.min("canonical_doc").alias("min_canonical"),
        )
        .orderBy("cluster_size")
    )


ORACLE_SQL = {
    "doc_chunk": f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, lang, toks,
                   unnest(range(1, greatest(len(toks) - 1, 1) + 1,
                                {CHUNK_STRIDE})) AS start,
                   generate_subscripts(range(1, greatest(len(toks) - 1, 1) + 1,
                                {CHUNK_STRIDE}), 1) - 1 AS chunk_id
            FROM t
        )
        SELECT doc_id, lang, chunk_id::BIGINT AS chunk_id,
               array_to_string(toks[start : start + {CHUNK_TOKENS} - 1], ' ')
                   AS chunk_text,
               least(len(toks) - start + 1, {CHUNK_TOKENS})::BIGINT AS n_tokens
        FROM s
    """,
    # Connected components as a recursive CTE: the edge set is the
    # already-oracled dedup_ngram_jaccard pair query (embedded
    # verbatim so the two can never drift) plus exact-duplicate
    # rep↔dup edges; component label = min reachable doc_id —
    # identical to the Spark side's label-propagation fixpoint.
    # Equality joins (not IS NOT DISTINCT FROM) so NULL-text docs get
    # no exact edges, matching Spark's null-dropping equi-join.
    "dedup_clusters": """
        WITH RECURSIVE pairs AS (
            SELECT doc_a, doc_b FROM (
                {NGRAM_PAIRS}
            )
            UNION
            SELECT r.rep AS doc_a, d.doc_id AS doc_b
            FROM documents d
            JOIN (SELECT md5(text) AS h, MIN(doc_id) AS rep
                  FROM documents GROUP BY md5(text)) r
              ON md5(d.text) = r.h AND d.doc_id <> r.rep
        ), edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ), nodes AS (
            SELECT DISTINCT src AS doc_id FROM edges
        ), reach AS (
            SELECT doc_id, doc_id AS r FROM nodes
            UNION
            SELECT e.dst AS doc_id, reach.r
            FROM reach JOIN edges e ON e.src = reach.doc_id
        ), labels AS (
            SELECT doc_id, MIN(r) AS label FROM reach GROUP BY doc_id
        ), clusters AS (
            SELECT label, COUNT(*)::BIGINT AS cluster_size,
                   MIN(doc_id) AS canonical_doc
            FROM labels GROUP BY label
        ), singles AS (
            SELECT doc_id AS label, 1::BIGINT AS cluster_size,
                   doc_id AS canonical_doc
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM nodes)
        ), allc AS (
            SELECT * FROM clusters UNION ALL SELECT * FROM singles
        )
        SELECT cluster_size,
               COUNT(*)::BIGINT AS n_clusters,
               MIN(canonical_doc) AS min_canonical
        FROM allc GROUP BY cluster_size ORDER BY cluster_size
    """.replace("{NGRAM_PAIRS}", _DEDUP_ORACLE_SQL["dedup_ngram_jaccard"]),
}

QUERIES = {
    "doc_chunk": doc_chunk,
    "dedup_clusters": dedup_clusters,
}

# Never-registered (driver window full): verified by the local
# harness in tests/test_retired_twins.py. The oracle embeds the
# doc_chunk CTE verbatim so the two can never drift.
RETIRED_TWIN_QUERIES = {"boilerplate_chunks": boilerplate_chunks}
RETIRED_TWIN_ORACLES = {
    "boilerplate_chunks": f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, lang, toks,
                   unnest(range(1, greatest(len(toks) - 1, 1) + 1,
                                {CHUNK_STRIDE})) AS start
            FROM t
        ), chunks AS (
            SELECT doc_id,
                   array_to_string(toks[start : start + {CHUNK_TOKENS} - 1], ' ')
                       AS chunk_text,
                   least(len(toks) - start + 1, {CHUNK_TOKENS})::BIGINT
                       AS n_tokens
            FROM s
        )
        SELECT md5(chunk_text)                  AS chunk_md5,
               COUNT(DISTINCT doc_id)::BIGINT   AS n_docs,
               COUNT(*)::BIGINT                 AS n_occurrences,
               MIN(doc_id)                      AS first_doc,
               MIN(n_tokens)                    AS n_tokens
        FROM chunks
        GROUP BY md5(chunk_text)
        HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    """,
}
