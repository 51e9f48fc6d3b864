"""cBioPortal mutation-dump preprocessing as a DataFrame program.

Reference parity: /root/reference/scripts/cbioportal/2_process/
extract_gene_study_chr.py (single-process Python + two web services).
Semantics preserved:

- conjunctive presence filter on (entrezGeneId, studyId, chr) (:130-135)
- study_id → DOID via the mapping dict (:104,139) — here a broadcast join
  against a mapping table; unmapped studies are surfaced separately
  (the reference logs them, :146)
- distinct (entrez_gene_id, chr, doid) triples via OrderedDict-as-set
  (:141-142) — dropDuplicates
- entrez → gene symbol enrichment (MyGene batch call, :48-94) — a broadcast
  join against a pre-materialized symbol table, with the reference's
  ``ENTREZ:{id}`` fallback for unmapped ids (:80-82,94)

The two network services become dictionary tables (SURVEY.md §2.1 S5): the
reference itself materializes their responses to disk before the pipeline
consumes them; here they are inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_gene_study_chr(
    mutations: DataFrame,
    study_doid_map: DataFrame,
    gene_symbols: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """mutations(entrezGeneId, studyId, chr, ...) → (records, unmapped_studies).

    records: distinct (entrez_gene_id, gene_symbol, chr, doid);
    unmapped_studies: distinct studyId with no DOID mapping.

    ``study_doid_map`` columns: (study_id, doid).
    ``gene_symbols`` columns: (entrez_gene_id, symbol); optional — absent,
    every gene falls back to ENTREZ:{id} (reference API-failure path :91-94).
    """
    present = mutations.filter(
        F.col("entrezGeneId").isNotNull()
        & F.col("studyId").isNotNull()
        & (F.col("studyId") != "")
        & F.col("chr").isNotNull()
        & (F.col("chr") != "")
    ).select(
        F.col("entrezGeneId").alias("entrez_gene_id"),
        F.col("studyId").alias("study_id"),
        F.col("chr").alias("chr"),
    )

    smap = F.broadcast(study_doid_map.select("study_id", "doid"))
    mapped = present.join(smap, "study_id", "left")

    unmapped_studies = (
        mapped.filter(F.col("doid").isNull()).select("study_id").distinct()
    )

    triples = (
        mapped.filter(F.col("doid").isNotNull())
        .select("entrez_gene_id", "chr", "doid")
        .dropDuplicates()
    )

    fallback = F.concat(F.lit("ENTREZ:"), F.col("entrez_gene_id").cast("string"))
    if gene_symbols is not None:
        # deterministic symbol per entrez id (a re-materialized symbol table
        # may carry synonyms; subset-key dropDuplicates would keep an
        # arbitrary one)
        gmap = F.broadcast(
            gene_symbols.groupBy("entrez_gene_id").agg(F.min("symbol").alias("_symbol"))
        )
        records = triples.join(gmap, "entrez_gene_id", "left").select(
            "entrez_gene_id",
            F.coalesce("_symbol", fallback).alias("gene_symbol"),
            "chr",
            "doid",
        )
    else:
        records = triples.select(
            "entrez_gene_id", fallback.alias("gene_symbol"), "chr", "doid"
        )
    return records, unmapped_studies
