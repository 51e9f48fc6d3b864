#!/usr/bin/env python
"""Measure the driver union-find vs distributed star-contraction crossover —
the evidence behind ``operators.canonicalize.DRIVER_CC_MAX_EDGES``.

``connected_components`` picks its strategy by edge count: below the
threshold it collects the pairs and runs union-find on the driver (one job
instead of ~4 iterations x 3 stages of distributed fixpoint); above it the
alternating large-star/small-star contraction runs. Both paths are proven
output-identical (tests/test_union_find_property.py); this bench decides
WHERE the switch belongs by timing both on the same synthetic equivalence
tables across edge counts, and recording the driver's RSS growth for the
collect path — the threshold must be safe on memory, not just faster:

    python jobs/bench_cc_crossover.py   (sizes via CC_SIZES, default
                                         10k,100k,500k,1m,2m)

Prints one JSON line per size:
    {"n_edges": N, "driver_uf_sec": a, "star_contraction_sec": b,
     "driver_rss_delta_mb": m, "driver_rss_peak_mb": p}

Edge shape mirrors the domain: ontology cross-reference cliques — every id
joins a clique of ~4 members plus 10% random extra cross-links, CURIE-length
string ids (the realistic per-pair driver memory cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [
    int(s.replace("k", "000").replace("m", "000000"))
    for s in os.environ.get("CC_SIZES", "10k,100k,500k,1m,2m").split(",")
]


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> None:
    from pyspark.sql import functions as F

    from adding_datasets_to_kg_spark.operators.canonicalize import (
        connected_components,
        star_contraction,
    )
    from adding_datasets_to_kg_spark.session import get_spark

    spark = get_spark("bench-cc-crossover", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    def edge_table(n: int):
        """~4-member cliques (i -> i - i%4) + 10% extra random cross-links,
        realistic CURIE-ish string ids; localCheckpoint so both strategies
        read identical materialized blocks, not a regenerating plan."""
        base = spark.range(n).select(
            F.format_string("MONDO:%08d", F.col("id")).alias("id_a"),
            F.format_string("MONDO:%08d", F.col("id") - F.col("id") % 4).alias("id_b"),
        )
        extra = (
            spark.range(n // 10)
            .select(
                F.format_string(
                    "MONDO:%08d", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n))
                ).alias("id_a"),
                F.format_string(
                    "MONDO:%08d", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n))
                ).alias("id_b"),
            )
        )
        return base.unionByName(extra).localCheckpoint(eager=True)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: compile both plan families once (codegen + first-collect cost
    # is constant and serial; the threshold decision is about steady state)
    warm = edge_table(10_000)
    force(connected_components(warm, driver_threshold=100_000))
    labels, _ = star_contraction(warm)
    force(labels)

    for n in SIZES:
        edges = edge_table(n)
        rss0 = _rss_mb()
        driver_walls, deltas = [], []
        for _ in range(2):
            t0 = time.time()
            # driver_threshold above n forces the collect+union-find path
            force(connected_components(edges, driver_threshold=n * 2))
            driver_walls.append(time.time() - t0)
            deltas.append(_rss_mb() - rss0)
        star_walls = []
        for _ in range(2):
            t0 = time.time()
            labels, _ = star_contraction(edges)
            force(labels)
            star_walls.append(time.time() - t0)
        print(
            json.dumps(
                {
                    "n_edges": n,
                    "driver_uf_sec": round(min(driver_walls), 2),
                    "star_contraction_sec": round(min(star_walls), 2),
                    "driver_rss_delta_mb": round(max(deltas), 1),
                    "driver_rss_peak_mb": round(_rss_mb(), 1),
                }
            ),
            flush=True,
        )
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
