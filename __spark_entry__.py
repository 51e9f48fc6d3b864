"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` pairs live in
``adding_datasets_to_kg_spark/plans/entry_queries.py`` — one entry per
implemented operator from SURVEY.md §2 plus the training-data-pipeline ops
(dedup / similarity / text analysis / multimodal plumbing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adding_datasets_to_kg_spark.plans.entry_queries import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-star extract→link→emit→census shape over sf0.001 —
    mention triples from documents, counted per entity (predicate census,
    reference README.md:278-306 analog)."""
    triples = QUERIES["kg_mentions_docs"](spark, SF0001)
    return (
        triples.groupBy("predicate", "object")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy(F.col("n_triples").desc(), F.col("object").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents — every ``queries()`` key has one (all 50
    registry entries are rows+schema+hash-checked; the formerly rows-only
    ``sim_topk_ivf`` / ``mm_media_features`` gained full oracles in r2)."""
    return dict(ORACLES)
