"""Identifier canonicalization: connected components over an equivalence
edge list, plus predicate normalization and edge endpoint remapping.

Reference parity (G1-G3 in SURVEY.md §2.11):
- clique collapse          ← Node Normalizer resolution driven by
  /root/reference/src/midas/normalize.py:29-37 — every raw CURIE maps to a
  preferred CURIE + equivalent_identifiers; we compute the same fixpoint from
  an offline ``id_equivalences(id_a, id_b)`` table via iterative min-id
  propagation (large-star/small-star style) — no GraphFrames dependency.
- predicate normalization  ← normalize.py:28,35 (predicate_map.jsonl) — a
  broadcast-join against a 2-column mapping table.
- endpoint remap           ← original_subject/original_object columns in
  /root/reference/scripts/preprocessing/convert_for_neptune_bulk.py:76-77,98-99.

Scale notes: the CC loop is the one genuinely iterative operator. Each round
is one shuffle on the id key; ``localCheckpoint(eager=True)`` truncates
lineage each round so plans stay O(1) deep. ID-equivalence cliques are tiny
(size 1-5 in practice), so convergence is ≤ ⌈log2(max diameter)⌉ rounds; we
bound it and assert convergence. Canonical member = lexicographic min —
deterministic, order-independent (deviation from the reference's
input-order-dependent first-wins, documented in SURVEY.md §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-id label propagation until fixpoint.

    Input: undirected equivalence edges (id_a, id_b). Output columns:
    ``id`` (member), ``canonical_id`` (lexicographic min of its component).
    Singleton ids (present only as self-pairs) map to themselves.
    """
    spark = edges.sparkSession
    # Symmetrize + add self-loops so every id labels itself initially.
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .unionByName(edges.select(F.col(id_a).alias("src"), F.col(id_a).alias("dst")))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_b).alias("dst")))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # labels: id -> current best (min) known component label
    labels = sym.groupBy(F.col("src").alias("id")).agg(
        F.least(F.min("dst"), F.first("src")).alias("label")
    )
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # propagate: each node adopts the min label among itself + neighbors
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_labels, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.col("nbr_label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.select("id", "label")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels.select(F.col("id"), F.col("label").alias("canonical_id"))


def normalization_map(
    ids: DataFrame, equivalences: DataFrame, id_col: str = "id"
) -> tuple[DataFrame, DataFrame]:
    """Resolve raw ids → (canonical_id, equivalent_identifiers), mirroring the
    normalization_map.json / normalization_failures.txt pair of
    /root/reference/src/midas/normalize.py:16-18.

    Returns (norm_map, failures):
      norm_map: id, canonical_id, equivalent_identifiers array<string>
      failures: id (raw ids with no entry in the equivalence table)
    """
    cc = connected_components(equivalences)
    members = cc.groupBy("canonical_id").agg(
        F.array_sort(F.collect_set("id")).alias("equivalent_identifiers")
    )
    norm = cc.join(members, "canonical_id").select(
        "id", "canonical_id", "equivalent_identifiers"
    )
    raw = ids.select(F.col(id_col).alias("id")).distinct()
    norm_map = raw.join(norm, "id", "inner")
    failures = raw.join(norm.select("id"), "id", "left_anti")
    return norm_map, failures


def normalize_predicates(edges: DataFrame, predicate_map: DataFrame) -> DataFrame:
    """G2: broadcast-join predicate rewrite; unmapped predicates pass through
    (normalize.py:28,35)."""
    pm = predicate_map.select(
        F.col("raw_predicate").alias("predicate"),
        F.col("biolink_predicate").alias("_norm_pred"),
    )
    return (
        edges.join(F.broadcast(pm), "predicate", "left")
        .withColumn("predicate", F.coalesce("_norm_pred", "predicate"))
        .drop("_norm_pred")
    )


def remap_edge_endpoints(edges: DataFrame, norm_map: DataFrame) -> DataFrame:
    """G3: rewrite subject/object to canonical ids, keeping originals
    (convert_for_neptune_bulk.py:76-77,98-99 column contract).

    Two broadcast-able joins when the norm map is dictionary-sized; Catalyst/
    AQE picks broadcast vs shuffle by actual size.
    """
    nm = norm_map.select("id", "canonical_id")
    subj = nm.withColumnRenamed("id", "subject").withColumnRenamed(
        "canonical_id", "_subj_canon"
    )
    obj = nm.withColumnRenamed("id", "object").withColumnRenamed(
        "canonical_id", "_obj_canon"
    )
    return (
        edges.join(subj, "subject", "left")
        .join(obj, "object", "left")
        .withColumn("original_subject", F.col("subject"))
        .withColumn("original_object", F.col("object"))
        .withColumn("subject", F.coalesce("_subj_canon", "subject"))
        .withColumn("object", F.coalesce("_obj_canon", "object"))
        .drop("_subj_canon", "_obj_canon")
    )
