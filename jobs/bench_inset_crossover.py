#!/usr/bin/env python
"""Measure the InSet-split vs broadcast-join-split crossover for
``_finalize_graph``'s ``max_inset_ids`` threshold.

The expression-split path collects the norm map's raw-id key set to the
driver and compiles ``subject isin(ids) OR object isin(ids)`` — past some
id count the py4j literal construction + multi-MB plan serialization beats
the join fallback's cost. This bench synthesizes a fixed edge corpus and
norm maps of increasing size, then times both paths end-to-end (plan
construction INCLUDED — that is where the InSet pathology lives).

    python jobs/bench_inset_crossover.py [n_edges]   (default 4,000,000)

Prints one JSON line per norm-map size with both walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [
    int(s)
    for s in os.environ.get(
        "INSET_SIZES", "100,250,500,1000,5000,10000,25000,50000"
    ).split(",")
]


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from adding_datasets_to_kg_spark.plans.pipeline import _finalize_graph
    from adding_datasets_to_kg_spark.session import get_spark

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_entities = max(n_edges // 4, 10)
    spark = get_spark("bench-inset-crossover", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    # Fixed synthetic graph: entity universe of n_entities ids, edges drawn
    # deterministically; the same persisted input feeds every configuration.
    ent = lambda c: F.format_string("ENT:%08d", F.pmod(F.xxhash64("id", F.lit(c)), F.lit(n_entities)))  # noqa: E731
    edges = (
        spark.range(n_edges)
        .select(
            ent(1).alias("subject"),
            F.lit("biolink:related_to").alias("predicate"),
            ent(2).alias("object"),
            F.lit("infores:bench").alias("primary_knowledge_source"),
        )
        .dropDuplicates(["subject", "predicate", "object"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    nodes = (
        edges.select(F.explode(F.array("subject", "object")).alias("id"))
        .distinct()
        .select(
            "id",
            F.lit(None).cast("string").alias("name"),
            F.array(F.lit("biolink:NamedThing")).alias("category"),
            F.lit(None).cast("map<string,string>").alias("properties"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes.count()

    def norm_map_of(k: int):
        # k raw ids in pairs: odd ids remap to the preceding even id, and the
        # even canonicals carry self-rows (normalization_map's contract).
        half = k // 2
        pairs = spark.range(half).select(
            F.format_string("ENT:%08d", F.col("id") * 2 + 1).alias("id"),
            F.format_string("ENT:%08d", F.col("id") * 2).alias("canonical_id"),
        )
        selfs = spark.range(half).select(
            F.format_string("ENT:%08d", F.col("id") * 2).alias("id"),
            F.format_string("ENT:%08d", F.col("id") * 2).alias("canonical_id"),
        )
        return (
            pairs.unionByName(selfs)
            .withColumn("equivalent_identifiers", F.array("id", "canonical_id"))
            .localCheckpoint(eager=True)
        )

    def run(nm, max_inset: int) -> float:
        t0 = time.time()
        nodes_out, edges_out = _finalize_graph(
            nodes, edges, nm, None, [], max_inset_ids=max_inset
        )
        edges_out.write.format("noop").mode("overwrite").save()
        nodes_out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm-up: compile both path shapes once
    warm = norm_map_of(1_000)
    run(warm, 10**9)
    run(warm, 0)

    for k in SIZES:
        nm = norm_map_of(k)
        inset = min(run(nm, 10**9) for _ in range(2))
        join = min(run(nm, 0) for _ in range(2))
        print(json.dumps({
            "norm_map_ids": k,
            "n_edges": n_edges,
            "inset_sec": inset,
            "join_sec": join,
            "winner": "inset" if inset <= join else "join",
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
