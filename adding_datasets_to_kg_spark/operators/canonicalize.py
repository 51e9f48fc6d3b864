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


DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Union-find with path compression; canonical = lexicographic min."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by lexicographic min so roots trend toward the canonical
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # second pass: exact min per component (union order may leave a non-min root)
    comp_min: dict[str, str] = {}
    for x in parent:
        r = find(x)
        if r not in comp_min or x < comp_min[r]:
            comp_min[r] = x
    return [(x, comp_min[find(x)]) for x in parent]


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    driver_threshold: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Min-id label propagation until fixpoint.

    Input: undirected equivalence edges (id_a, id_b). Output columns:
    ``id`` (member), ``canonical_id`` (lexicographic min of its component).
    Singleton ids (present only as self-pairs) map to themselves.

    Strategy is adaptive: equivalence tables are dictionary-scale in this
    domain (ontology cross-references, not transcript-scale), so below
    ``driver_threshold`` edges we collect and run union-find on the driver —
    one job instead of ~4 iterations × 3 stages of distributed fixpoint.
    Above the threshold the iterative min-label-propagation join loop runs
    (each round one shuffle + localCheckpoint to truncate lineage). Both
    paths produce identical output (verified by tests at the boundary).
    Set driver_threshold=0 to force the distributed path.
    """
    spark = edges.sparkSession
    if driver_threshold > 0 and edges.limit(driver_threshold + 1).count() <= driver_threshold:
        pairs = [
            (r[0], r[1])
            for r in edges.select(id_a, id_b).collect()
        ]
        out = _driver_union_find(pairs)
        if not out:
            return spark.createDataFrame([], "id string, canonical_id string")
        return spark.createDataFrame(out, "id string, canonical_id string")
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

    The norm map is dictionary-sized by construction (its key space is the
    entity-id universe, not the transcript universe), but it reaches here
    through localCheckpointed CC output whose size Catalyst can't estimate —
    without an explicit hint both joins planned as 64/128-task sort-merge
    joins over a 30-row table. Broadcast explicitly.
    """
    nm = F.broadcast(norm_map.select("id", "canonical_id"))
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
