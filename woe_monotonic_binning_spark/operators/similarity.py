"""Similarity search over embedding columns.

Two tiers (SURVEY.md beyond-reference ops):
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query set
  against the full corpus, one map-side pass + a per-query top-k.  The
  per-query heap is a window row_number over (query, cosine): at scale
  prefer the aggregate form, but the window stays correct and AQE keeps the
  single shuffle balanced because the partition key is the query id.
- ``ivf_topk`` — IVF-style approximate search: assign every corpus vector to
  its nearest centroid (broadcast centroids), probe the ``n_probe`` closest
  centroids per query, exact-rank only inside probed cells.  Cuts the
  scanned fraction to ~n_probe/n_cells of the corpus.

Centroids here come from a deterministic sample + one Lloyd refinement
(``train_centroids``) — at 100 TB you would train on a sample anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine_similarity, dot, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self excluded).

    Returns (query_id, neighbor_id, cosine, rank).  Deterministic tiebreak
    on (cosine desc, neighbor_id).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF codebook: seed with the ``n_cells`` lowest-id
    vectors, then run ``lloyd_iters`` distributed Lloyd refinements
    (assign -> mean per cell).  Driver holds only n_cells vectors."""
    seeds = [
        [float(x) for x in r[0]]
        for r in corpus.orderBy(id_col).select(vec_col).limit(n_cells).collect()
    ]
    centroids = seeds
    for _ in range(lloyd_iters):
        assigned = assign_cells(corpus, centroids, vec_col, id_col)
        dim = len(centroids[0])
        means = (
            assigned.groupBy("cell")
            .agg(
                *[
                    F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"d{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = {r["cell"]: [float(r[f"d{i}"]) for i in range(dim)] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, c_vec array<double>",
    )


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment via broadcast join + argmax — one pass."""
    spark = corpus.sparkSession
    cdf = _centroid_df(spark, centroids)
    scored = corpus.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell"),
        cosine_similarity(F.col(vec_col).cast("array<double>"), F.col("c_vec")).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: rank only inside the ``n_probe`` cells nearest to
    each query.  Same output schema as ``brute_force_topk``."""
    spark = corpus.sparkSession
    cdf = _centroid_df(spark, centroids)
    assigned = assign_cells(corpus, centroids, vec_col, id_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_cells = q.crossJoin(F.broadcast(cdf)).select(
        "query_id",
        "q_vec",
        "cell",
        cosine_similarity(F.col("q_vec").cast("array<double>"), F.col("c_vec")).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_similarity(F.col("q_vec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
