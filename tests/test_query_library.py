"""Query-library (read surface) tests over a pipeline-built KG."""

import pytest

from adding_datasets_to_kg_spark.datagen import transcripts as dg
from adding_datasets_to_kg_spark.plans import query_library as ql
from adding_datasets_to_kg_spark.plans.pipeline import Lexicons, run_pipeline


@pytest.fixture(scope="module")
def kg(spark):
    lex = Lexicons(
        gene=dg.gene_lexicon_df(spark),
        disease=dg.disease_lexicon_df(spark),
        variant=dg.variant_lexicon_df(spark),
        id_equivalences=dg.id_equivalences_df(spark),
        predicate_map=dg.predicate_map_df(spark),
    )
    corpus = spark.createDataFrame(dg.generate_corpus(30, seed=5), dg.TRANSCRIPT_SCHEMA)
    out = run_pipeline(corpus, lex, compute_metadata=False)
    ql.register_views(out["nodes"], out["edges"])
    return out


def test_schema_summary(spark, kg):
    s = ql.schema_summary(spark)
    assert "biolink:Gene" in s["labels"]
    assert "biolink:mentions" in s["relationship_types"]
    assert {"id", "name", "category"} <= set(s["node_columns"])
    assert {"subject", "predicate", "object"} <= set(s["edge_columns"])


def test_global_counts(spark, kg):
    row = ql.global_counts(spark).collect()[0]
    assert row["total_nodes"] > 0 and row["total_edges"] > 0


def test_find_entity_and_neighbors(spark, kg):
    hits = ql.find_entity(spark, "breast", category="biolink:Disease").collect()
    assert hits and all("breast" in r["name"].lower() for r in hits)
    disease_id = hits[0]["id"]
    nb = ql.neighbors(spark, disease_id).collect()
    assert nb  # diseases are mentioned by turns at minimum
    assert all(r["direction"] in ("in", "out") for r in nb)


def test_top_connected_and_two_hop(spark, kg):
    top = ql.top_connected(
        spark, "biolink:Disease", "biolink:mentions", n=3
    ).collect()
    assert 1 <= len(top) <= 3
    assert top[0]["n_connected"] >= top[-1]["n_connected"]
    # two-hop from a turn: TURN -mentions-> entity -...-> other
    e = kg["edges"].limit(1).collect()[0]
    paths = ql.two_hop(spark, e["subject"]).collect()
    for p in paths:
        assert p["a"] == e["subject"] and p["c"] != p["a"]
