#!/usr/bin/env python
"""Measure forced-broadcast vs unhinted (AQE-chosen) remap joins across
norm-map sizes — the evidence behind ``hints.MAX_BROADCAST_HINT_ROWS``.

The pipeline's endpoint remap joins a corpus-scale edge table against the
norm map twice (subject + object). With a FORCED ``F.broadcast`` hint the
map is built and shipped no matter its size; without the hint, Spark plans
sort-merge initially (checkpointed maps carry no stats) and AQE converts to
broadcast at runtime when the materialized size fits
``autoBroadcastJoinThreshold``. This bench times both plan shapes on the
same persisted fact table across map sizes, min-of-2 per cell:

    python jobs/bench_broadcast_crossover.py [n_edges]   (default 4,000,000)

Prints one JSON line per map size. The question is NOT "when does broadcast
lose" (on one box with a warm map it rarely does before memory becomes the
binding constraint) but "how long does the hint stay clearly worth forcing"
— past the point where the two walls converge, the forced hint buys nothing
measurable while silently assuming the map fits executor memory, so the
guard surrenders the choice to AQE there.
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
        "BCAST_SIZES", "1000,10000,100000,500000,1000000,2000000,4000000"
    ).split(",")
]


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from adding_datasets_to_kg_spark.operators.canonicalize import remap_edge_endpoints
    from adding_datasets_to_kg_spark.session import get_spark

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_entities = max(n_edges // 4, 10)
    spark = get_spark("bench-broadcast-crossover", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    ent = lambda c: F.format_string("ENT:%08d", F.pmod(F.xxhash64("id", F.lit(c)), F.lit(n_entities)))  # noqa: E731
    edges = (
        spark.range(n_edges)
        .select(
            ent(1).alias("subject"),
            F.lit("biolink:related_to").alias("predicate"),
            ent(2).alias("object"),
            F.lit("infores:bench").alias("primary_knowledge_source"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()

    def norm_map_of(k: int):
        return (
            spark.range(k)
            .select(
                F.format_string("ENT:%08d", F.col("id")).alias("id"),
                F.format_string("ENT:%08d", F.col("id") - F.col("id") % 2).alias(
                    "canonical_id"
                ),
            )
            .localCheckpoint(eager=True)
        )

    def run(nm, rows_hint) -> float:
        t0 = time.time()
        remap_edge_endpoints(edges, nm, norm_map_rows=rows_hint).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.time() - t0, 2)

    warm = norm_map_of(1000)
    run(warm, 1)          # forced-broadcast shape
    run(warm, 10**12)     # unhinted shape

    for k in SIZES:
        nm = norm_map_of(k)
        forced = min(run(nm, 1) for _ in range(2))
        unhinted = min(run(nm, 10**12) for _ in range(2))
        print(json.dumps({
            "norm_map_rows": k,
            "n_edges": n_edges,
            "forced_broadcast_sec": forced,
            "unhinted_aqe_sec": unhinted,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
