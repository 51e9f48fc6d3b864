"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:
- brute-force top-k — exact; query set broadcast against the corpus, one
  narrow shuffle for the per-query top-k window. Baseline + oracle.
- IVF (inverted-file) top-k — corpus pre-clustered into n_cells via
  deterministic seed points; queries probe only their nearest n_probe cells.
  The 100 TB path: candidate set shrinks by ~n_cells/n_probe, and the join
  is an equi-join on cell id.

All distances computed with JVM-side zip_with/aggregate expressions in
double precision (functions.vectors) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot


def topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, window row_number
    per query ordered by (rounded score desc, neighbor id asc) — fully
    deterministic. Output: (query_id, neighbor_id, rank, cos)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 3).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def build_ivf_cells(corpus: DataFrame, n_cells: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: cell centroids = the n_cells corpus vectors
    with the lowest ids (seed points; cheap, deterministic, and good enough
    for bucketing — a k-means refinement can swap in transparently).

    Returns (assignments(id, cell_id), centroids(cell_id, centroid)).
    """
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col).asc())).alias("cell_id"),
            as_double(vec_col).alias("centroid"),
        )
    )
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    scored = c.join(F.broadcast(centroids)).select(
        id_col,
        "cell_id",
        cosine(F.col("v"), F.col("centroid")).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell_id").asc())
    assignments = (
        scored.withColumn("r", F.row_number().over(w)).filter("r = 1").select(id_col, "cell_id")
    )
    return assignments, centroids


def topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5, n_cells: int = 16,
             n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-bucketed approximate top-k: probe the n_probe nearest cells only.

    Scale shape: corpus scored once against n_cells broadcast centroids
    (narrow), then the query↔corpus join is an equi-join on cell_id touching
    ~n_probe/n_cells of the corpus per query.
    """
    assignments, centroids = build_ivf_cells(corpus, n_cells, id_col, vec_col)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    c = c.join(assignments.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")

    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    q_scored = q.join(F.broadcast(centroids)).select(
        "query_id", "qv", "cell_id", cosine(F.col("qv"), F.col("centroid")).alias("sim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell_id").asc())
    probes = (
        q_scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    scored = probes.join(c, "cell_id").filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 3).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
