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


def _lsh_signature(vec: Column) -> Column:
    """H-bit random-hyperplane signature of a double-array column:
    per plane, sign of dot(vec, plane) sets one bit."""
    sig = None
    for p in range(ANN_PLANES):
        plane = F.array(*[F.lit(c) for c in _hyperplane_values(p)])
        proj = _dot(vec, plane)
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: probe only the query's bucket.

    At 100 TB the corpus is signature-bucketed once (write-time
    partitioning on `bucket`), and each query touches 1/2^H of the
    data. Multi-probe (flipping low-confidence bits) would raise
    recall at the same plan shape.
    """
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    sig = emb.withColumn("bucket", _lsh_signature(F.col("v")))
    queries = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    corpus = sig.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("bucket").alias("cb"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("cb") == F.col("qb")
    ).select(
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


IVF_CENTROIDS = 8
IVF_ITERATIONS = 3
IVF_NPROBE = 2


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer, queries
    probe their IVF_NPROBE nearest centroid cells.

    Deterministic: initial centroids are the vectors with the smallest
    xxhash64(vec_id) picked via TakeOrdered (parallel partial top-k —
    never a global single-partition sort), then IVF_ITERATIONS Lloyd
    steps run as join+aggregate rounds with ``localCheckpoint``
    truncating lineage (same iterative pattern as dedup_clusters).
    Centroid means are rounded to 9 dp to damp float merge-order
    sensitivity across partitionings. At 100 TB the cell assignment is
    written once at ingest (partition by cell); queries touch nprobe/k
    of the corpus.
    """
    emb = load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    emb = emb.localCheckpoint()  # reused across Lloyd iterations

    # orderBy+limit plans as TakeOrderedAndProject; the 8-row result
    # then gets cell ids from a window over just those 8 rows
    init_key = F.xxhash64(F.col("vec_id").cast("string"))
    seeds = emb.select("vec_id", "v", init_key.alias("_k")).orderBy("_k").limit(
        IVF_CENTROIDS
    )
    w_seed = Window.orderBy("_k")
    centroids = seeds.select(
        F.row_number().over(w_seed).alias("cell"), F.col("v").alias("cv")
    ).localCheckpoint()

    def nearest_cell(vec_col: str, cents: DataFrame) -> DataFrame:
        """Assign each vector to its max-cosine centroid — map-side
        argmax via max_by over (sim, -cell), no per-row window sort."""
        scored = emb.join(F.broadcast(cents)).select(
            "vec_id",
            "v",
            "cell",
            _cosine(F.col(vec_col), F.col("cv")).alias("sim"),
        )
        return (
            scored.groupBy("vec_id")
            .agg(
                F.max_by(
                    F.col("cell"), F.struct(F.col("sim"), -F.col("cell"))
                ).alias("cell"),
                F.first("v").alias("v"),  # constant per vec_id
            )
            .select("vec_id", "v", "cell")
        )

    for _ in range(IVF_ITERATIONS):
        assigned = nearest_cell("v", centroids)
        # new centroid = element-wise mean of members (posexplode +
        # per-dimension avg + reassemble in dimension order)
        dims = assigned.select(
            "cell", F.posexplode("v").alias("d", "x")
        )
        centroids = (
            dims.groupBy("cell", "d")
            .agg(F.round(F.avg("x"), 9).alias("mx"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", "mx"))
                ).alias("pairs")
            )
            .select(
                "cell",
                F.transform("pairs", lambda p: p["mx"]).alias("cv"),
            )
        ).localCheckpoint()

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
