"""Canned query library over the materialized KG — the Spark SQL analog of
the reference's Neptune/openCypher read surface.

Reference parity (SURVEY.md §3.2, G7/A6-A9):
- schema introspection      ← CALL db.labels()/db.relationshipTypes()
  (reference scripts/agent/simple_neptune_agent.py:40-44)
- global counts             ← MATCH (n) RETURN count(n) (lines 104-111)
- name-substring entity lookup ← get_disease_info/get_drug_info (lines 70-92)
- neighbor expansion        ← MATCH (d)-[r]-(x) ... LIMIT (lines 59-68)
- top-N by group            ← "top 5 diseases with most associated drugs"
  (notebooks/03_midas-test_agent.ipynb cell 1)
- 2-hop pattern             ← MATCH (a)-[r1]->(b)-[r2]->(c) chains

Every MATCH pattern compiles to node⋈edge⋈node equi-joins over the two
registered views — Catalyst handles join order; the node side is usually the
small side and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODES_VIEW = "kg_nodes"
EDGES_VIEW = "kg_edges"


def register_views(nodes: DataFrame, edges: DataFrame) -> None:
    nodes.createOrReplaceTempView(NODES_VIEW)
    edges.createOrReplaceTempView(EDGES_VIEW)


def schema_summary(spark: SparkSession) -> dict:
    """db.labels() / db.relationshipTypes() / db.propertyKeys() analog."""
    labels = [
        r["category"]
        for r in spark.sql(
            f"SELECT DISTINCT explode(category) AS category FROM {NODES_VIEW} ORDER BY category"
        ).collect()
    ]
    rel_types = [
        r["predicate"]
        for r in spark.sql(
            f"SELECT DISTINCT predicate FROM {EDGES_VIEW} ORDER BY predicate"
        ).collect()
    ]
    node_props = [f.name for f in spark.table(NODES_VIEW).schema.fields]
    edge_props = [f.name for f in spark.table(EDGES_VIEW).schema.fields]
    return {
        "labels": labels,
        "relationship_types": rel_types,
        "node_columns": node_props,
        "edge_columns": edge_props,
    }


def global_counts(spark: SparkSession) -> DataFrame:
    """MATCH (n) RETURN count(n) / MATCH ()-[r]->() RETURN count(r)."""
    return spark.sql(
        f"""
        SELECT (SELECT count(*) FROM {NODES_VIEW}) AS total_nodes,
               (SELECT count(*) FROM {EDGES_VIEW}) AS total_edges
        """
    )


def find_entity(spark: SparkSession, name_substring: str, category: str | None = None,
                limit: int = 5) -> DataFrame:
    """get_disease_info/get_drug_info analog: case-insensitive name search,
    optional category filter, deterministic order."""
    df = spark.table(NODES_VIEW).filter(
        F.lower(F.coalesce(F.col("name"), F.lit(""))).contains(name_substring.lower())
    )
    if category:
        df = df.filter(F.array_contains("category", category))
    return df.orderBy("id").limit(limit)


def neighbors(spark: SparkSession, node_id: str, limit: int = 20) -> DataFrame:
    """MATCH (d)-[r]-(x) undirected expansion around one node."""
    e = spark.table(EDGES_VIEW)
    out = e.filter(F.col("subject") == node_id).select(
        F.lit("out").alias("direction"), "predicate", F.col("object").alias("neighbor_id")
    )
    inn = e.filter(F.col("object") == node_id).select(
        F.lit("in").alias("direction"), "predicate", F.col("subject").alias("neighbor_id")
    )
    n = spark.table(NODES_VIEW).select(
        F.col("id").alias("neighbor_id"), F.col("name").alias("neighbor_name")
    )
    return (
        out.unionByName(inn)
        .join(n, "neighbor_id", "left")
        .orderBy("direction", "predicate", "neighbor_id")
        .limit(limit)
    )


def top_connected(spark: SparkSession, category: str, predicate: str, n: int = 5) -> DataFrame:
    """'top 5 diseases with most associated drugs' shape: for nodes of
    ``category``, count distinct neighbors over ``predicate`` edges."""
    e = spark.table(EDGES_VIEW).filter(F.col("predicate") == predicate)
    nodes = spark.table(NODES_VIEW).filter(F.array_contains("category", category)).select(
        F.col("id"), F.col("name")
    )
    counts = (
        e.join(nodes, e.object == nodes.id)
        .groupBy("id", "name")
        .agg(F.countDistinct("subject").alias("n_connected"))
        .orderBy(F.col("n_connected").desc(), F.col("id").asc())
        .limit(n)
    )
    return counts


def two_hop(spark: SparkSession, start_id: str, limit: int = 20) -> DataFrame:
    """MATCH (a)-[r1]->(b)-[r2]->(c) WHERE a.id = ... RETURN path."""
    e1 = spark.table(EDGES_VIEW).select(
        F.col("subject").alias("a"), F.col("predicate").alias("p1"), F.col("object").alias("b")
    ).filter(F.col("a") == start_id)
    e2 = spark.table(EDGES_VIEW).select(
        F.col("subject").alias("b"), F.col("predicate").alias("p2"), F.col("object").alias("c")
    )
    return (
        e1.join(e2, "b")
        .filter(F.col("c") != F.col("a"))
        .orderBy("p1", "b", "p2", "c")
        .limit(limit)
    )
