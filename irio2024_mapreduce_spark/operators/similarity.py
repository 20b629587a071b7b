"""Similarity search over embeddings — SURVEY.md §2.3 E23.

Two paths:

* **similarity_topk** — exact brute-force cosine top-k. The query set
  is tiny and explicitly broadcast, so the corpus is scanned once,
  map-side, with NO shuffle of the corpus: the only exchange is the
  per-query top-k (a window over candidate rows, k·|queries| rows).
  All arithmetic in double via codegen'd higher-order functions
  (``zip_with`` + ``aggregate``) — no UDF, no Python.
* **similarity_ann** — the 100 TB path: random-hyperplane LSH.
  Corpus vectors are bucketed by an H-bit signature (H seeded
  pseudo-random hyperplanes built from ``xxhash64``, so the "random"
  planes are deterministic and cluster-reproducible); queries probe
  only their own bucket. Recall vs the exact path is asserted in
  tests. An IVF variant would swap the signature for a k-means
  assignment — same plan shape (bucket equi-join), different
  bucketing function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from irio2024_mapreduce_spark.sources.tables import load_table, load_table_parallel

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
ANN_PLANES = 8
EMB_DIM = 64


def _as_double(col: str = "embedding") -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 corpus neighbors for each query vector."""
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    scored = corpus.join(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_values(plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1],
    derived from a fixed public mixer (splitmix64) over (plane, dim) —
    plain Python floats folded into ARRAY LITERALS, so the whole
    plane contributes one constant node to the plan instead of 64
    hash expressions (a 512-node signature tree measurably dominated
    this query's runtime via plan/codegen cost)."""

    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return x ^ (x >> 31)

    return [
        (mix(plane * 1_000_003 + d) / float(2**63)) - 1.0
        for d in range(EMB_DIM)
    ]


ANN_TABLES = 4  # independent hash tables (fresh planes per table)
ANN_PROBE_BITS = 4  # multi-probe: flip the lowest-|projection| bits

# Recall of hyperplane LSH is governed by per-plane agreement
# p = 1 − θ/π: with L tables and multi-probe over the ANN_PROBE_BITS
# least-confident planes (singles + pairs), a true neighbor is found
# with 1−(1−t)^L where t ≈ P(≤2 sign mismatches, all at probed
# planes). On clustered data (neighbor cosine ≥ 0.9, p ≈ 0.86) that
# is ≥ 0.95; on unclustered data (this synthetic corpus: top-5 cosine
# ≈ 0.33, p ≈ 0.61) no sublinear bucketing reaches 0.8 — the
# measured floor is asserted in tests for both regimes.


def _masks() -> Column:
    # single parsed literal — used many times per plan; per-element
    # F.lit calls would multiply py4j round-trips
    return F.expr(
        "array(" + ", ".join(f"{1 << p}L" for p in range(ANN_PLANES)) + ")"
    )


def _planes_matrix() -> Column:
    """ALL tables' planes as one nested array literal
    (ANN_TABLES·ANN_PLANES × EMB_DIM doubles), built as a single SQL
    expression string. Two reasons: (a) constant-folds to one Literal
    node so every projection is ONE ``transform`` over it — 32
    separate per-plane dot expressions made plan/codegen cost dominate
    at small data (the r01 similarity lesson); (b) one py4j call —
    building it from 2048 nested ``F.lit``/``F.array`` calls spent
    ~6 s of driver time on py4j round-trips alone. The ``D`` suffix
    parses each component as DOUBLE (bare decimals parse as DECIMAL)."""
    rows = ", ".join(
        "array(" + ", ".join(f"{c!r}D" for c in _hyperplane_values(i)) + ")"
        for i in range(ANN_TABLES * ANN_PLANES)
    )
    return F.expr(f"array({rows})")


def _all_projections(vec: Column) -> Column:
    """array<double> of dot(vec, plane) for every table's planes."""
    return F.transform(_planes_matrix(), lambda pl: _dot(vec, pl))


def _sig_of(projs: Column) -> Column:
    """H-bit signature: bit p set iff projection p is positive."""
    return F.aggregate(
        F.zip_with(
            projs,
            _masks(),
            lambda x, m: F.when(x > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _probes_of(sig: Column, projs: Column) -> Column:
    """Probe buckets for a query: its own signature plus every
    single- and pair-flip of the ANN_PROBE_BITS planes with the
    smallest |projection| (the bits most likely to disagree with a
    true neighbor's signature sit closest to the hyperplane).

    Flip planes are picked by sorting (|proj|, plane-index) STRUCTS —
    value-based array_position would resolve tied |projections| (e.g.
    a zero vector) to the same first index, collapsing distinct probes
    back into the primary bucket."""
    idx = F.expr(
        "array(" + ", ".join(str(p) for p in range(ANN_PLANES)) + ")"
    )
    ranked = F.array_sort(
        F.zip_with(
            projs,
            idx,
            lambda x, i: F.struct(F.abs(x).alias("a"), i.alias("i")),
        )
    )
    flip_masks = [
        F.element_at(
            _masks(), (F.element_at(ranked, k + 1)["i"] + 1).cast("int")
        )
        for k in range(ANN_PROBE_BITS)
    ]
    probes = [sig]
    probes += [sig.bitwiseXOR(m) for m in flip_masks]
    probes += [
        sig.bitwiseXOR(flip_masks[i]).bitwiseXOR(flip_masks[j])
        for i in range(ANN_PROBE_BITS)
        for j in range(i + 1, ANN_PROBE_BITS)
    ]
    return F.array_distinct(F.array(*probes))


def _ann_topk(emb: DataFrame) -> DataFrame:
    """Multi-table multi-probe hyperplane-LSH approximate top-k over
    an (vec_id, v:array<double>) frame. The plan stays a bucketed
    equi-join: corpus rows explode to (table, sig) — at 100 TB these
    are written once, partitioned by (table, sig) — and each query
    probes its own bucket plus the low-confidence flips, touching
    L·probes/2^H of the corpus instead of all of it."""
    all_projs = emb.select(
        "vec_id", "v", _all_projections(F.col("v")).alias("ap")
    )
    projected = all_projs.select(
        "vec_id",
        "v",
        *[
            F.slice("ap", t * ANN_PLANES + 1, ANN_PLANES).alias(f"projs_{t}")
            for t in range(ANN_TABLES)
        ],
    )
    sigs = projected.select(
        "vec_id",
        "v",
        *[F.col(f"projs_{t}") for t in range(ANN_TABLES)],
        *[
            _sig_of(F.col(f"projs_{t}")).alias(f"sig_{t}")
            for t in range(ANN_TABLES)
        ],
    )
    corpus = sigs.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.col(f"sig_{t}").alias("cb"),
                    )
                    for t in range(ANN_TABLES)
                ]
            )
        ).alias("ts"),
    ).select("neighbor_id", "cv", "ts.tbl", "ts.cb")
    queries = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _probes_of(
                                F.col(f"sig_{t}"), F.col(f"projs_{t}")
                            ).alias("probes"),
                        )
                        for t in range(ANN_TABLES)
                    ]
                )
            ).alias("tp"),
        )
        .select(
            "query_id", "qv", F.col("tp.tbl").alias("qtbl"),
            F.explode("tp.probes").alias("probe"),
        )
    )
    # a pair can collide in several tables/probes — dedupe candidates
    # BEFORE scoring so each cosine is computed once
    cand = (
        corpus.join(
            F.broadcast(queries),
            (F.col("tbl") == F.col("qtbl")) & (F.col("cb") == F.col("probe")),
        )
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: multi-table signatures with
    multi-probe queries (see :func:`_ann_topk`)."""
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    return _ann_topk(emb)


IVF_CENTROIDS = 8
IVF_ITERATIONS = 3
IVF_NPROBE = 2

# observability: Lloyd rounds the last similarity_ivf call actually ran
# (the fixpoint probe can stop the loop early) — read by tests/probes
_LAST_IVF_ROUNDS = 0


def _centroid_update(assigned: DataFrame) -> DataFrame:
    """New centroid per cell = element-wise mean of member vectors.

    Computed as EMB_DIM per-dimension AVG columns over one groupBy —
    the same shape as the simhash bit votes: avg partials (sum,
    count) ride map-side combine, so the shuffle carries one
    EMB_DIM-column row per (cell, partition) instead of the old
    posexplode form's EMB_DIM rows per member vector (64× row
    inflation through the Lloyd-round shuffle). ``try_element_at``
    (NULL, never an ANSI error, on a short vector) + ``avg`` (skips
    NULLs with a per-dimension denominator) preserve the posexplode
    form's graceful handling of ragged/NULL-element vectors. Means
    are rounded to 9 dp to damp float merge-order sensitivity across
    partitionings (same as before)."""
    means = assigned.groupBy("cell").agg(
        *[
            F.round(F.avg(F.try_element_at("v", F.lit(d + 1))), 9).alias(
                f"_m{d}"
            )
            for d in range(EMB_DIM)
        ],
    )
    return means.select(
        "cell",
        F.array(*[F.col(f"_m{d}") for d in range(EMB_DIM)]).alias("cv"),
    )


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer, queries
    probe their IVF_NPROBE nearest centroid cells.

    Deterministic: initial centroids are the vectors with the smallest
    xxhash64(vec_id) picked via TakeOrdered (parallel partial top-k —
    never a global single-partition sort), then IVF_ITERATIONS Lloyd
    steps, each a map-only broadcast assignment (see ``nearest_cell``
    — zero exchange) plus one per-cell mean aggregation, with lazy
    ``localCheckpoint`` truncating lineage (same iterative pattern as
    dedup_clusters). Centroid means are rounded to 9 dp to damp float
    merge-order sensitivity across partitionings. At 100 TB the cell
    assignment is written once at ingest (partition by cell); queries
    touch nprobe/k of the corpus.
    """
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    # reused across Lloyd iterations; lazy — the first broadcast/agg
    # materializes it inside an already-running job
    emb = emb.localCheckpoint(eager=False)

    # orderBy+limit plans as TakeOrderedAndProject; the 8-row result
    # then gets cell ids from a window over just those 8 rows
    init_key = F.xxhash64(F.col("vec_id").cast("string"))
    seeds = emb.select("vec_id", "v", init_key.alias("_k")).orderBy("_k").limit(
        IVF_CENTROIDS
    )
    w_seed = Window.orderBy("_k")
    centroids = seeds.select(
        F.row_number().over(w_seed).alias("cell"), F.col("v").alias("cv")
    ).localCheckpoint(eager=False)

    def nearest_cell(vec_col: str, cents: DataFrame) -> DataFrame:
        """Assign each vector to its max-cosine centroid with NO
        shuffle: the k centroids collapse to ONE broadcast row
        holding an array of (cell, cv) structs, and the argmax is a
        per-row ``array_max`` over (sim, -cell) structs — fieldwise
        struct comparison picks max sim, ties to the smallest cell,
        exactly the former max_by semantics. The old join+groupBy
        form shuffled k rows per vector every Lloyd round; this is
        embarrassingly parallel map work (at 100 TB, assignment cost
        is one corpus pass, no exchange)."""
        unit = F.transform(
            "cv", lambda x: x / F.sqrt(_dot(F.col("cv"), F.col("cv")))
        )
        cent_row = cents.select("cell", unit.alias("cu")).agg(
            F.collect_list(F.struct("cell", "cu")).alias("_cents")
        )
        vnorm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
        return (
            emb.join(F.broadcast(cent_row))
            .select(
                "vec_id",
                "v",
                "_cents",
                vnorm.alias("_vn"),
            )
            .select(
                "vec_id",
                "v",
                F.array_max(
                    F.transform(
                        "_cents",
                        lambda c: F.struct(
                            (_dot(F.col(vec_col), c["cu"]) / F.col("_vn"))
                            .alias("sim"),
                            (-c["cell"]).alias("negcell"),
                        ),
                    )
                )["negcell"].cast("int").alias("_nc"),
            )
            .select("vec_id", "v", (-F.col("_nc")).alias("cell"))
        )

    global _LAST_IVF_ROUNDS
    prev_cents = None
    for _round in range(IVF_ITERATIONS):
        assigned = nearest_cell("v", centroids)
        # lazy: the next round's broadcast (or the final probe join)
        # materializes it — lineage still truncates at that point, so
        # round plans don't compound
        centroids = _centroid_update(assigned).localCheckpoint(eager=False)
        # fixpoint probe: the quantizer is IVF_CENTROIDS rows of
        # 9dp-rounded means — collecting it is the same job the next
        # consumer would trigger (the lazy checkpoint materializes
        # once either way), and identical consecutive centroid sets
        # mean every later Lloyd round would reproduce them verbatim
        # (assignment is a pure function of centroid values), so the
        # remaining corpus-pass rounds are skipped outright
        cur_cents = sorted(
            (r["cell"], tuple(r["cv"])) for r in centroids.collect()
        )
        _LAST_IVF_ROUNDS = _round + 1
        if cur_cents == prev_cents:
            break
        prev_cents = cur_cents

    corpus_cells = nearest_cell("v", centroids).filter(
        F.col("vec_id") >= N_QUERIES
    )
    # queries probe their IVF_NPROBE closest cells
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    q_scored = q.join(F.broadcast(centroids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "cell",
        _cosine(F.col("v"), F.col("cv")).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
    q_cells = (
        q_scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= IVF_NPROBE)
        .select("query_id", "qv", "cell")
    )
    scored = corpus_cells.join(F.broadcast(q_cells), "cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


ORACLE_SQL = {
    "similarity_topk": f"""
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                         6) AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                                / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                                   * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                                6) DESC,
                                c.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ) WHERE rank <= {TOP_K}
    """,
    # similarity_ann: seeded-hash hyperplanes aren't expressible in
    # DuckDB SQL → rows-only; recall vs similarity_topk asserted in tests.
}

QUERIES = {
    "similarity_topk": similarity_topk,
    "similarity_ann": similarity_ann,
    "similarity_ivf": similarity_ivf,
}
