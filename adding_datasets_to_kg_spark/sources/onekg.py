"""1000-Genomes VEP JSONL → KGX nodes/edges.

Reference parity: /root/reference/src/midas/convert_data.py:84-117.
- records without ``transcript_consequences`` are skipped (lines 91-92);
- variant id = first consequence carrying BOTH hgvsg and spdi, formatted via
  the NC_-contig graft rule (line 93; util.py:30-36);
- gene id = first consequence's gene_id, NCBIGene-prefixed (line 94);
- per-population allele frequencies parsed from the trailing
  ``AFR=..;AMR=..;EAS=..;EUR=..;SAS=..`` blob of the raw VCF ``input`` line
  (lines 97-110) — 14 lines of Python replaced by one ``str_to_map``;
- predicate decoded from ``most_severe_consequence`` (line 114; util.py:38-49).

Deviation (documented): the reference stores frequencies as a list of
single-key dicts; we store a flat ``map<population,frequency>`` in node
properties — same information, columnar-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..functions.curie import GENE, SEQUENCE_VARIANT, consequence_predicate, curie, format_hgvsg
from .kgx import conform_edges, conform_nodes

INFORES = "infores:1000genomes"
POPULATIONS = ("AFR", "AMR", "EAS", "EUR", "SAS")

# Explicit schema of the VEP fields the converter consumes. Inference would
# (a) cost an extra full scan and (b) CRASH on shards where no sampled
# record carries hgvsg/spdi — the inferred struct then lacks the field and
# tc['spdi'] fails analysis instead of yielding null/skip like the
# reference's per-record loop (convert_data.py:93). Same reasoning as
# kgx.read_kgx_jsonl's explicit schema.
VEP_SCHEMA = StructType(
    [
        StructField("input", StringType(), True),
        StructField("most_severe_consequence", StringType(), True),
        StructField(
            "transcript_consequences",
            ArrayType(
                StructType(
                    [
                        StructField("hgvsg", StringType(), True),
                        StructField("spdi", StringType(), True),
                        StructField("gene_id", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def read_vep_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: line-delimited VEP JSON scan (convert_data.py:87-90), explicit
    schema — extra JSON fields are ignored, absent fields read as null."""
    return spark.read.schema(VEP_SCHEMA).json(path)


def onekg_to_kgx(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    # P5: key-presence predicate (convert_data.py:91-92)
    has_tc = df.filter(
        F.col("transcript_consequences").isNotNull()
        & (F.size("transcript_consequences") > 0)
    )

    # A10/F12: first array element matching a predicate (convert_data.py:93)
    first_hgvs_tc = F.try_element_at(
        F.filter(
            F.col("transcript_consequences"),
            lambda tc: tc["hgvsg"].isNotNull() & tc["spdi"].isNotNull(),
        ),
        F.lit(1),
    )
    first_tc = F.try_element_at(F.col("transcript_consequences"), F.lit(1))

    # F7: kv-blob → map (convert_data.py:97-110). The frequency blob is the
    # last whitespace field of the raw VCF line. Empty fields are dropped
    # first: Spark's split keeps a trailing '' on lines with trailing
    # whitespace (Python's .split() — the reference — does not).
    freq_blob = F.element_at(
        F.filter(F.split(F.col("input"), r"\s+"), lambda t: t != ""), -1
    )
    freq_map = F.str_to_map(freq_blob, F.lit(";"), F.lit("="))

    src = has_tc.select(
        F.when(
            first_hgvs_tc.isNotNull(),
            format_hgvsg(first_hgvs_tc["hgvsg"], first_hgvs_tc["spdi"]),
        ).alias("variant_id"),
        F.when(
            first_tc["gene_id"].isNotNull(), curie("NCBIGene", first_tc["gene_id"])
        ).alias("gene_id"),
        F.col("most_severe_consequence").cast("string").alias("msc"),
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in POPULATIONS]),
            F.array(*[freq_map[F.lit(p)] for p in POPULATIONS]),
        ).alias("frequencies"),
    ).filter(F.col("variant_id").isNotNull())

    variant_nodes = src.select(
        F.col("variant_id").alias("id"),
        F.lit(None).cast("string").alias("name"),
        F.array(F.lit(SEQUENCE_VARIANT)).alias("category"),
        F.col("frequencies").alias("properties"),
    )
    gene_nodes = src.filter(F.col("gene_id").isNotNull()).select(
        F.col("gene_id").alias("id"),
        F.lit(None).cast("string").alias("name"),
        F.array(F.lit(GENE)).alias("category"),
    )
    nodes = conform_nodes(variant_nodes).unionByName(conform_nodes(gene_nodes))

    edges = conform_edges(
        src.filter(F.col("gene_id").isNotNull()).select(
            F.col("variant_id").alias("subject"),
            consequence_predicate(F.col("msc")).alias("predicate"),
            F.col("gene_id").alias("object"),
            F.lit(INFORES).alias("primary_knowledge_source"),
            F.create_map(F.lit("most_severe_consequence"), F.col("msc")).alias(
                "properties"
            ),
        )
    )
    return nodes, edges
