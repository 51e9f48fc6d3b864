"""Graph merge: n-way union of per-source KGX graphs + dedup-merge into the
"goldenKG" node/edge tables.

Reference parity (G4, J8, U1/U2 in SURVEY.md §2):
- per-source unions        ← /root/reference/src/midas/merge.py:9-10,19-22
- node merge semantics     ← orion merge_kgx_files [ORION, public]: same-id
  node records merge (union of categories/properties, one winning name);
  edges are concatenated across sources (goldenKG edge count = Σ source
  counts per the reference README.md:278-306 census).

Scale notes: the node merge is ONE hash aggregate on id. Hot ids (TP53-style
hubs appear in every source) make the groupBy skewed, so we pre-aggregate on
a salted key first (two-phase: salt → partial merge → final merge). AQE skew
handling covers the join paths; the explicit salt covers the aggregation
path, which AQE does not split.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.kgx import NODE_COLS

DEFAULT_SALT_BUCKETS = 16


def _merged_name() -> F.Column:
    # Deterministic name pick: shortest non-empty, ties by lexicographic min.
    # (Reference is first-wins = input-order-dependent; we need a stable
    # result under any partitioning — documented deviation, SURVEY.md §7.4.4.)
    return F.min(
        F.when(
            F.col("name").isNotNull() & (F.col("name") != ""),
            F.struct(F.length("name").alias("l"), F.col("name").alias("n")),
        )
    )["n"]


def _prop_entries_partial() -> F.Column:
    # partial aggregate: union of (key, value) property entries
    return F.array_distinct(
        F.flatten(
            F.collect_list(F.map_entries(F.coalesce("properties", F.create_map())))
        )
    )


def _entries_to_map(entries: F.Column) -> F.Column:
    """Deterministic property union: sort entries by (key, value) and keep
    the FIRST value per key — i.e. per-key lexicographic-min, stable under
    any partitioning. (F.first(properties) — the round-1 choice — was
    order-dependent whenever two sources disagreed on a key.)"""
    return F.aggregate(
        F.array_sort(entries),
        F.create_map().cast("map<string,string>"),
        lambda acc, e: F.when(
            F.array_contains(F.map_keys(acc), e["key"]), acc
        ).otherwise(F.map_concat(acc, F.create_map(e["key"], e["value"]))),
    )


def merge_nodes(nodes: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Two-phase salted node merge on id (J8).

    Every aggregate here is order-independent (min-struct name, set-union
    category, sorted per-key-min property union), so the salt assignment —
    which only exists to spread hot ids across partial-agg buckets — cannot
    influence the result.
    """
    salted = nodes.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy("id", "_salt").agg(
        _merged_name().alias("name"),
        F.array_distinct(
            F.flatten(F.collect_list(F.coalesce("category", F.array())))
        ).alias("category"),
        _prop_entries_partial().alias("_prop_entries"),
    )
    final = partial.groupBy("id").agg(
        _merged_name().alias("name"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("category")))).alias(
            "category"
        ),
        F.array_distinct(F.flatten(F.collect_list("_prop_entries"))).alias("_all_entries"),
    )
    merged_props = F.when(
        F.size("_all_entries") > 0, _entries_to_map(F.col("_all_entries"))
    ).otherwise(F.lit(None).cast("map<string,string>"))
    return final.withColumn("properties", merged_props).select(*NODE_COLS)


def dedup_edges(edges: DataFrame) -> DataFrame:
    """Exact-key edge dedup on (subject, predicate, object, source).

    The reference keeps duplicate edges across sources (counts are additive);
    within a source the writer emits what the converter emits. We expose
    dedup as a separate operator so merge() can be configured either way.
    """
    return edges.dropDuplicates(
        ["subject", "predicate", "object", "primary_knowledge_source"]
    )


def merge_graphs(
    node_dfs: list[DataFrame],
    edge_dfs: list[DataFrame],
    dedup_cross_source_edges: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """U1/U2 + J8: union per-source graphs, merge nodes, concat edges
    (merge.py:19-22 semantics)."""
    nodes = reduce(DataFrame.unionByName, node_dfs)
    edges = reduce(DataFrame.unionByName, edge_dfs)
    merged_nodes = merge_nodes(nodes)
    if dedup_cross_source_edges:
        edges = dedup_edges(edges)
    return merged_nodes, edges
