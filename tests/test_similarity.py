"""ANN quality: IVF-probed top-k recall against the exact brute-force oracle."""

import pytest
from pyspark.sql import functions as F

from adding_datasets_to_kg_spark.operators.similarity import topk_bruteforce, topk_ivf

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_recall_vs_bruteforce(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    exact = topk_bruteforce(embs, queries, k=5)
    approx = topk_ivf(embs, queries, k=5, n_cells=16, n_probe=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the cells must recover most exact neighbors
    assert recall >= 0.6, f"recall@5 {recall:.2f}"
    # approx scores are true cosines: every overlapping pair agrees exactly
    es = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact.collect()}
    aps = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in approx.collect()}
    for key in e & a:
        assert es[key] == aps[key]


def test_ivf_refined_recall_gate_sf01(spark):
    """The explicit quality gate: k-means-refined IVF recovers >= 0.9 of the
    exact top-5 at sf0.1 (2 Lloyd iterations, 8/16 cells probed)."""
    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 30).withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in topk_bruteforce(embs, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in topk_ivf(embs, queries, k=5, n_cells=16, n_probe=8,
                                refine_iters=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f}"


def test_refined_centroids_deterministic(spark):
    """Seed centroids + Lloyd steps contain no RNG: two builds agree."""
    from adding_datasets_to_kg_spark.operators.similarity import build_ivf_cells

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _, c1 = build_ivf_cells(embs, n_cells=8, refine_iters=2)
    _, c2 = build_ivf_cells(embs, n_cells=8, refine_iters=2)
    r1 = {r.cell_id: r.centroid for r in c1.collect()}
    r2 = {r.cell_id: r.centroid for r in c2.collect()}
    assert r1 == r2


def test_unrolled_vector_math_bit_identical_to_hof(spark):
    """dot_unrolled/cosine_unrolled are codegen'd reformulations of the HOF
    dot/cosine — same element-order summation, so the doubles must be
    BIT-identical (the DuckDB oracles depend on it)."""
    from adding_datasets_to_kg_spark.functions.vectors import (
        as_double, cosine, cosine_unrolled, dot, dot_literal,
    )
    from adding_datasets_to_kg_spark.operators.dedup import hyperplane_signs
    from pyspark.sql import functions as F

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = embs.select("vec_id", as_double("embedding").alias("v"))
    a = d.alias("a").join(d.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
    both = a.select(
        cosine(F.col("a.v"), F.col("b.v")).alias("hof"),
        cosine_unrolled("a.v", "b.v").alias("unrolled"),
    )
    # null-safe inequality: plain <> filters out NULL comparisons, which is
    # exactly the failure mode a broken unrolled sum would have
    assert both.count() > 0
    assert both.filter(~F.col("hof").eqNullSafe(F.col("unrolled"))).count() == 0

    plane = hyperplane_signs(1, 64)[0]
    lit = F.array(*[F.lit(x) for x in plane])
    pd_ = d.select(
        dot(F.col("v"), lit).alias("hof"),
        dot_literal("v", plane).alias("unrolled"),
    )
    assert pd_.count() > 0
    assert pd_.filter(~F.col("hof").eqNullSafe(F.col("unrolled"))).count() == 0


def test_unrolled_vector_math_rejects_wrong_dimension(spark):
    """dot/cosine_unrolled must fail loudly — not silently truncate — when a
    vector's length differs from the static dim."""
    import pytest
    from adding_datasets_to_kg_spark.functions.vectors import cosine_unrolled
    from pyspark.sql import functions as F

    rows = [(1, [1.0] * 128), (2, [2.0] * 128)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    pair = df.alias("a").join(df.alias("b"), F.col("a.id") < F.col("b.id"))
    with pytest.raises(Exception, match="dimension 64"):
        pair.select(cosine_unrolled("a.v", "b.v").alias("c")).collect()


def test_refine_centroids_zero_iters_is_noop(spark):
    """n_iters=0 must return the seed centroids unchanged (regression: `mid`
    was only bound inside the loop, so a direct 0-iteration call raised
    NameError instead of no-op-ing)."""
    from adding_datasets_to_kg_spark.functions.vectors import as_double
    from adding_datasets_to_kg_spark.operators.similarity import refine_centroids

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c = embs.select(F.col("vec_id"), as_double("embedding").alias("v"))
    seeds = embs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), as_double("embedding").alias("centroid")
    )
    out = refine_centroids(c, seeds, n_iters=0)
    assert {r.cell_id: r.centroid for r in out.collect()} == {
        r.cell_id: r.centroid for r in seeds.collect()
    }


@pytest.mark.parametrize("n_cells,n_probe", [(16, 8), (64, 16)])
def test_ivf_recall_holds_as_cells_grow(spark, n_cells, n_probe):
    """Cell-count scaling evidence: recall@5 >= 0.9 holds when the index
    grows from 16 to 64 cells with the probe FRACTION shrinking 1/2 -> 1/4
    — the √n-style growth path for the 100× operating point (measured
    0.947 at 64/16, 0.920 even at 64/8; deterministic, so stable)."""
    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 30).withColumnRenamed("vec_id", "query_id")
    exact = {(r.query_id, r.neighbor_id)
             for r in topk_bruteforce(embs, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in topk_ivf(embs, queries, k=5, n_cells=n_cells,
                                n_probe=n_probe, refine_iters=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f} at n_cells={n_cells}"


def test_ivf_auto_sized_recall_gate_sf01(spark):
    """n_cells=None auto-sizes to ~sqrt(n) (2000 vectors -> 45 cells,
    n_probe -> 12): recall@5 >= 0.9 must hold at the auto-sized point, and
    the sizing helper itself must follow the sqrt rule."""
    from adding_datasets_to_kg_spark.operators.similarity import auto_n_cells

    assert auto_n_cells(2000) == 45
    assert auto_n_cells(1) == 1
    assert auto_n_cells(10**12) == 10**6

    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = embs.filter("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = {(r.query_id, r.neighbor_id)
             for r in topk_bruteforce(embs, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in topk_ivf(embs, queries, k=5, n_cells=None, n_probe=None,
                                refine_iters=2, corpus_rows=2000).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f} at auto-sized n_cells"
