"""CIViC TSV → KGX nodes/edges, as one declarative DataFrame program.

Reference parity: /root/reference/src/midas/convert_data.py:11-56 (row loop
re-expressed as filtered projections + union). Quirks preserved exactly:
- variant NODE requires non-empty allele_registry_id AND name not containing
  "unrecognized" (convert_data.py:28) — but variant EDGES do not re-check
  "unrecognized" (convert_data.py:36,50);
- variant→disease edge additionally requires "CAID:" in the variant id
  (convert_data.py:36);
- therapy ids are comma-packed and NCIT-prefixed (convert_data.py:27,41-43);
- gene/therapy nodes are written without categories (convert_data.py:44,51).

Scale: source scan is a single TSV read with pushed projections; the five
node/edge families are narrow selects unioned lazily — Catalyst fuses them
into one scan per family (no Python in the loop, no shuffle until dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import DISEASE, SEQUENCE_VARIANT
from .kgx import conform_edges, conform_nodes

INFORES = "infores:civic"


def read_civic_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1: CIViC 10-column TSV scan (convert_data.py:13-17)."""
    return spark.read.option("sep", "\t").option("header", True).csv(path)


def _nonempty(c: str) -> F.Column:
    return F.col(c).isNotNull() & (F.col(c) != "")


def civic_to_kgx(civic: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Emit (nodes, edges) DataFrames with the reference's exact semantics."""
    src = civic.select(
        F.col("allele_registry_id").alias("variant_id"),
        F.col("variant").alias("variant_name"),
        F.col("doid").alias("disease_id"),
        F.col("disease").alias("disease_name"),
        F.col("ncbi_gene_id").alias("gene_id"),
        F.col("gene_symbol").alias("gene_symbol"),
        F.split(F.coalesce(F.col("ncit_ids"), F.lit("")), ",").alias("therapy_ids"),
    )

    variant_nodes = (
        # coalesce: csv reads empty fields as NULL, and ~NULL.contains(...)
        # is NULL (row silently dropped) — the reference's DictReader sees ""
        # and keeps the row (convert_data.py:28), name written as ""
        src.filter(
            _nonempty("variant_id")
            & ~F.coalesce(F.col("variant_name"), F.lit("")).contains("unrecognized")
        )
        .select(
            F.col("variant_id").alias("id"),
            F.col("variant_name").alias("name"),
            F.array(F.lit(SEQUENCE_VARIANT)).alias("category"),
        )
    )
    disease_nodes = src.filter(_nonempty("disease_id")).select(
        F.col("disease_id").alias("id"),
        F.col("disease_name").alias("name"),
        F.array(F.lit(DISEASE)).alias("category"),
    )
    gene_nodes = src.filter(_nonempty("variant_id") & _nonempty("gene_id")).select(
        F.col("gene_id").alias("id"),
        F.col("gene_symbol").alias("name"),
        F.lit(None).cast("array<string>").alias("category"),
    )
    therapy = src.filter(_nonempty("disease_id")).select(
        "disease_id", F.explode("therapy_ids").alias("tid")
    ).filter(F.col("tid") != "")
    therapy_nodes = therapy.select(
        F.concat(F.lit("NCIT:"), F.col("tid")).alias("id"),
        F.lit("").alias("name"),
        F.lit(None).cast("array<string>").alias("category"),
    )

    nodes = conform_nodes(variant_nodes).unionByName(
        conform_nodes(disease_nodes)
    ).unionByName(conform_nodes(gene_nodes)).unionByName(conform_nodes(therapy_nodes))

    vd_edges = src.filter(
        _nonempty("variant_id")
        & _nonempty("disease_id")
        & F.col("variant_id").contains("CAID:")
    ).select(
        F.col("variant_id").alias("subject"),
        F.lit("biolink:genetically_associated_with").alias("predicate"),
        F.col("disease_id").alias("object"),
        F.lit(INFORES).alias("primary_knowledge_source"),
    )
    td_edges = therapy.select(
        F.concat(F.lit("NCIT:"), F.col("tid")).alias("subject"),
        F.lit("biolink:applied_to_treat").alias("predicate"),
        F.col("disease_id").alias("object"),
        F.lit(INFORES).alias("primary_knowledge_source"),
    )
    vg_edges = src.filter(_nonempty("variant_id") & _nonempty("gene_id")).select(
        F.col("variant_id").alias("subject"),
        F.lit("biolink:is_sequence_variant_of").alias("predicate"),
        F.col("gene_id").alias("object"),
        F.lit(INFORES).alias("primary_knowledge_source"),
    )

    edges = conform_edges(vd_edges).unionByName(conform_edges(td_edges)).unionByName(
        conform_edges(vg_edges)
    )
    return nodes, edges
