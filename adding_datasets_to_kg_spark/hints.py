"""Size-guarded join-strategy hints.

An explicit ``F.broadcast`` bypasses ``spark.sql.autoBroadcastJoinThreshold``
entirely: Spark will build and ship the broadcast relation no matter how big
the table turns out to be, and a norm map that is dictionary-sized in this
domain (ontology lexicons, ~10⁴ CURIEs) is NOT guaranteed to stay that way —
the reference's own v2 graph has 2.6M nodes, and a 100× entity universe
(tens of millions of CURIEs × equivalent-identifier arrays) would push a
forced broadcast past driver/executor memory with no fallback.

``guarded_broadcast`` keeps the hint only while the caller-measured row
count is inside a bound; past it the hint is dropped and the optimizer
chooses (AQE will still broadcast from actual runtime stats when the table
genuinely fits ``autoBroadcastJoinThreshold``, and falls back to
sort-merge/shuffled-hash otherwise).

The default bound is measured, not guessed: jobs/bench_broadcast_crossover.py
times the pipeline's remap join shape (corpus-scale fact table, norm-map
dim) with the hint forced vs dropped across dim sizes — see BENCH.md for the
table recorded on this host.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Measured on this host (jobs/bench_broadcast_crossover.py, 4M-row persisted
# fact table, local[32], min-of-2, forced vs unhinted wall seconds):
#   rows:      1k    10k   100k  500k  1M    2M    4M
#   forced:    1.00  0.91  0.72  0.96  1.50  1.71  3.10
#   unhinted:  1.05  0.70  0.97  1.34  1.24  1.80  1.87
# The two shapes are within this host's documented ±50% noise through 2M
# rows; at 4M the forced build clearly loses. So past 1M rows the hint buys
# nothing measurable while silently assuming the map fits driver+executor
# memory (1M rows of (id, canonical_id, equivalent_identifiers) ≈ 150 MB
# serialized — already past the session's 64 MB autoBroadcastJoinThreshold)
# — surrender the decision to AQE's runtime stats there.
MAX_BROADCAST_HINT_ROWS = int(os.environ.get("SPARK_GRAFT_MAX_BROADCAST_ROWS", "1000000"))


def guarded_broadcast(df: DataFrame, n_rows: int | None,
                      max_rows: int | None = None) -> DataFrame:
    """``F.broadcast(df)`` only while ``n_rows`` is known to fit the bound.

    ``n_rows=None`` means the caller asserts dictionary scale without having
    measured (static lexicons, predicate maps) — the hint is kept, matching
    the pre-guard behavior. Callers on the corpus-influenced path (the norm
    map, whose size grows with the observed entity universe) MUST pass the
    measured count; the pipeline counts its localCheckpointed norm map once
    and threads the number through every consumer.
    """
    bound = MAX_BROADCAST_HINT_ROWS if max_rows is None else max_rows
    if n_rows is None or n_rows <= bound:
        return F.broadcast(df)
    return df
