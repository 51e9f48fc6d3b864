"""cBioPortal JSON array → KGX nodes/edges.

Reference parity: /root/reference/src/midas/convert_data.py:58-82.
- gene id is ``NCBIGene:{entrez_gene_id}`` (convert_data.py:72); the only
  effective reference-side filter is a non-empty doid (convert_data.py:75-76);
- disease node carries no name (convert_data.py:78);
- one gene→disease edge per input row, infores:cbioportal.

Documented deviation: rows with a null entrez_gene_id get their DISEASE node
emitted but no gene node/edge — the reference f-string would fabricate the
id ``NCBIGene:None`` for them (always-truthy in its filter), which is a data
bug we decline to reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import DISEASE, GENE, curie
from .kgx import conform_edges, conform_nodes

INFORES = "infores:cbioportal"


def read_cbioportal_json(spark: SparkSession, path: str) -> DataFrame:
    """S2: whole-file JSON array scan (convert_data.py:60-63)."""
    return spark.read.option("multiLine", True).json(path)


def cbioportal_to_kgx(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    with_doid = df.select(
        F.col("entrez_gene_id"),
        curie("NCBIGene", F.col("entrez_gene_id")).alias("gene_id"),
        F.col("gene_symbol").alias("gene_name"),
        F.col("doid").alias("disease_id"),
    ).filter(F.col("disease_id").isNotNull() & (F.col("disease_id") != ""))
    # gene side additionally requires a real entrez id (see module note)
    src = with_doid.filter(F.col("entrez_gene_id").isNotNull())

    gene_nodes = src.select(
        F.col("gene_id").alias("id"),
        F.col("gene_name").alias("name"),
        F.array(F.lit(GENE)).alias("category"),
    )
    disease_nodes = with_doid.select(
        F.col("disease_id").alias("id"),
        F.lit(None).cast("string").alias("name"),
        F.array(F.lit(DISEASE)).alias("category"),
    )
    nodes = conform_nodes(gene_nodes).unionByName(conform_nodes(disease_nodes))

    edges = conform_edges(
        src.select(
            F.col("gene_id").alias("subject"),
            F.lit("biolink:gene_associated_with_condition").alias("predicate"),
            F.col("disease_id").alias("object"),
            F.lit(INFORES).alias("primary_knowledge_source"),
        )
    )
    return nodes, edges
