"""CURIE construction + biomedical predicate decode, as Catalyst expressions.

Reference parity (all as native column expressions, JVM-side):
- ``format_hgvsg``          ← /root/reference/src/midas/util.py:30-36
- ``consequence_predicate`` ← /root/reference/src/midas/util.py:38-49
- CURIE prefix constructors ← /root/reference/src/midas/convert_data.py:43,72,94

No Python UDFs: everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SO term → Biolink predicate (reference util.py:39-47; default util.py:49).
SO_TERM_TO_PREDICATE: dict[str, str] = {
    "splice_region_variant": "biolink:splice_site_variant_of",
    "splice_polymiridine_variant": "biolink:is_splice_site_variant_of",
    "frameshift_variant": "biolink:is_frameshift_variant_of",
    "missense_variant": "biolink:is_missense_variant_of",
    "protein_altering_variant": "biolink:protein_altering_variant",
    "synonymous_variant": "biolink:is_synonymous_variant_of",
    "intron_variant": "biolink:is_non_coding_variant_of",
}
DEFAULT_CONSEQUENCE_PREDICATE = "biolink:is_molecular_consequence_of"

# Biolink categories used by the reference converters
# (orion.biolink_constants via convert_data.py:6).
GENE = "biolink:Gene"
DISEASE = "biolink:Disease"
SEQUENCE_VARIANT = "biolink:SequenceVariant"
CHEMICAL = "biolink:ChemicalEntity"


def curie(prefix: str, col: Column | str) -> Column:
    """``f"{prefix}:{value}"`` constructor (convert_data.py:43,72)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix + ":"), c.cast("string"))


def format_hgvsg(hgvsg: Column, spdi: Column) -> Column:
    """HGVS CURIE with contig grafted from SPDI when hgvsg lacks an NC_ contig.

    Mirrors reference util.py:30-36: if hgvsg starts with ``NC_`` use it
    verbatim; else replace its first segment with the SPDI contig.
    """
    spdi_contig = F.split_part(spdi, F.lit(":"), F.lit(1))
    # hgvsg segments after the first, re-joined with ':'
    tail = F.array_join(F.slice(F.split(hgvsg, ":"), 2, 1000), ":")
    return F.when(
        hgvsg.startswith("NC_"), F.concat(F.lit("HGVS:"), hgvsg)
    ).otherwise(F.concat(F.lit("HGVS:"), spdi_contig, F.lit(":"), tail))


def consequence_predicate(so_term: Column) -> Column:
    """SO term → Biolink predicate with default (util.py:38-49).

    Implemented as a literal ``create_map`` + ``coalesce`` so the decode is a
    constant-folded JVM expression, not a lookup-table shuffle.
    """
    pairs: list[Column] = []
    for k, v in SO_TERM_TO_PREDICATE.items():
        pairs.extend([F.lit(k), F.lit(v)])
    mapping = F.create_map(*pairs)
    return F.coalesce(mapping[so_term], F.lit(DEFAULT_CONSEQUENCE_PREDICATE))
