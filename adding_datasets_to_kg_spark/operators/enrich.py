"""Batched external enrichment over id-batches (S5/U4 in SURVEY.md §2.1/§2.9).

The reference enriches ids through batched HTTP calls — one MyGene POST for
ALL collected entrez ids (/root/reference/scripts/cbioportal/2_process/
extract_gene_study_chr.py:48-94) and Node Normalizer batches inside the
normalizer (/root/reference/src/midas/normalize.py:29-37). The engine keeps
network out of the runtime (SURVEY §2.1 S5 note: dictionaries are
pre-materialized tables + broadcast joins), but the SHAPE — "call an external
resolver once per id-batch, never per row" — needs a concrete distributed
home. This is it: ``mapInPandas`` streaming Arrow batches, sub-chunked to the
resolver's batch budget, resolver called once per chunk with the chunk's
distinct ids.

Scale notes: enrichment stays fully parallel (each partition drives its own
resolver calls); ``batch_size`` bounds the per-call payload exactly like the
reference's batched POST; the resolver is a plain picklable callable so an
HTTP client, a model endpoint, or the offline-dictionary default all plug in
unchanged. For resolvers that ARE dictionaries, prefer a broadcast join —
this operator exists for resolvers that must stay callables.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StructField, StructType, _parse_datatype_string


def dictionary_resolver(mapping: dict) -> Callable[[list], dict]:
    """Offline default: resolve ids from a fixed dictionary (missing → None).
    Mirrors running the reference pipeline from its pre-downloaded mapping
    files instead of live endpoints."""
    def resolve(ids: list) -> dict:
        return {i: mapping.get(i) for i in ids}

    return resolve


def enrich_batched(
    df: DataFrame,
    id_col: str,
    resolver: Callable[[list], dict],
    out_col: str = "enriched",
    out_type: str = "string",
    batch_size: int = 1000,
) -> DataFrame:
    """Attach ``out_col`` = resolver result per id, calling ``resolver`` once
    per batch of ≤ ``batch_size`` DISTINCT ids (batch-granular, never
    per-row). Adds ``batch_n_ids`` — the distinct-id count of the resolver
    call that served each row — as an observable witness of the batching.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(out_col, _parse_datatype_string(out_type), True),
            StructField("batch_n_ids", IntegerType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # vectorized batching: factorize assigns each DISTINCT id one
            # code; code // batch_size is its resolver batch — no per-row
            # Python loop (an index-at-a-time scan here was the slow path
            # for million-row Arrow batches)
            codes, uniques = pd.factorize(pdf[id_col])
            batch_of_row = codes // batch_size  # code -1 (null id) → batch -1
            # one O(n) pass: groupby yields each batch's rows without
            # re-masking the whole frame per batch
            for b, chunk in pdf.groupby(batch_of_row, sort=True):
                chunk = chunk.copy()
                if b < 0:
                    chunk[out_col] = None
                    chunk["batch_n_ids"] = 0
                    yield chunk
                    continue
                ids = sorted(uniques[b * batch_size : (b + 1) * batch_size])
                resolved = resolver(ids)
                chunk[out_col] = chunk[id_col].map(resolved)
                chunk["batch_n_ids"] = len(ids)
                yield chunk

    return df.mapInPandas(gen, schema=out_schema)
