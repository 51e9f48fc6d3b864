"""CIViC raw-dump preprocessing ETL as one declarative DataFrame program.

Reference parity: /root/reference/scripts/preprocessing/extract_civic_data.py
(pandas, single process) and the therapy→NCIT enrichment of
/root/reference/scripts/preprocessing/map_therapy_id_revised.py. Semantics
preserved:

- ``variant_ids`` list-literal parse with comma-split fallback (:16-28)
- molecular-profile → variant explode + numeric coerce + dedup (:77-85)
- feature join for gene symbols (:101-104)
- clinical ⟕ mp_map ⟕ variant_with_gene merge chain (:115-118)
- normalize_doid / normalize_ca / normalize_ncbi_gene (:30-59), NaN → null
- 7-column projection with ``therapies`` → ``therapy`` rename (:128-136)
- therapy enrichment: order-insensitive canonical token-set key equi-join
  (map_therapy_id_revised.py:51-59,104-105) with per-token explode →
  lookup → sorted re-agg fallback (:108-121)

Scale notes: the three fact/dim joins run as broadcast joins when the dim
side is dictionary-sized (features, therapy map); everything is native
expressions — the pandas ``apply`` UDFs of the reference become ``when``/
``cast`` chains inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import COMBO_SEP_REGEX, canon_token, canonical_set_key


def parse_list_like(col: Column) -> Column:
    """'[12, 13]' → array; fallback: comma-split; empty/'nan' → empty array
    (extract_civic_data.py:16-28). The fallback strips quotes as well as
    brackets: Python-repr lists like "['12', '13']" are single-quoted, which
    from_json rejects (invalid JSON) but the reference's ast.literal_eval
    accepts — without the quote strip every id in such rows parsed to NULL."""
    s = F.trim(col.cast("string"))
    parsed = F.from_json(s, "array<string>")
    fallback = F.filter(
        F.transform(
            F.split(s, ","), lambda x: F.trim(F.regexp_replace(x, r"""[\[\]'"]""", ""))
        ),
        lambda x: x != "",
    )
    return F.when(
        col.isNull() | (s == "") | (F.lower(s) == "nan"), F.array().cast("array<string>")
    ).otherwise(F.coalesce(parsed, fallback))


def normalize_doid(col: Column) -> Column:
    """extract_civic_data.py:30-39: keep DOID:-prefixed, else int-coerce."""
    s = F.trim(col.cast("string"))
    n = s.try_cast("double").try_cast("bigint")
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(s.startswith("DOID:"), s)
        .when(n.isNotNull(), F.concat(F.lit("DOID:"), n.cast("string")))
        .otherwise(F.lit(None))
    )


def normalize_ca(col: Column) -> Column:
    """extract_civic_data.py:41-46: force CAID: prefix."""
    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("CAID:"), F.trim(col.cast("string"))))


def normalize_ncbi_gene(col: Column) -> Column:
    """extract_civic_data.py:48-59: NCBIGene:N for numeric-like / keep
    prefixed; else null."""
    s = F.trim(col.cast("string"))
    n = s.try_cast("double").try_cast("bigint")
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(F.upper(s).startswith("NCBIGENE:"), s)
        .when(n.isNotNull(), F.concat(F.lit("NCBIGene:"), n.cast("string")))
        .otherwise(F.lit(None))
    )


def mp_variant_map(mps: DataFrame) -> DataFrame:
    """MolecularProfile → variant mapping (extract_civic_data.py:77-85):
    parse list column, explode, numeric coerce, dedup."""
    exploded = mps.select(
        "molecular_profile_id",
        F.explode(parse_list_like(F.col("variant_ids"))).alias("variant_id_str"),
    )
    return (
        exploded.withColumn(
            "variant_id", F.col("variant_id_str").try_cast("double").try_cast("bigint")
        )
        .filter(F.col("variant_id").isNotNull())
        .select("molecular_profile_id", "variant_id")
        .dropDuplicates()
    )


def extract_civic_bigfile(
    clinical: DataFrame,
    mps: DataFrame,
    variants: DataFrame,
    features: DataFrame,
) -> DataFrame:
    """The full extract_civic_data.py chain → 7-column 'bigfile' DataFrame."""
    allele_col = next(
        (c for c in ("allele_registry_id", "allele_registry_ids", "allele_registry")
         if c in variants.columns),
        None,
    )
    variant_cols = ["variant_id", "variant", "feature_id", "entrez_id"]
    variant_min = variants.select(
        *variant_cols,
        *( [F.col(allele_col).alias("_allele_raw")] if allele_col else
           [F.lit(None).cast("string").alias("_allele_raw")] ),
    )
    feature_min = F.broadcast(
        features.select("feature_id", F.col("name").alias("gene_symbol"))
    )
    variant_with_gene = variant_min.join(feature_min, "feature_id", "left").withColumn(
        "ncbi_gene_id", normalize_ncbi_gene(F.col("entrez_id"))
    )
    clinical_min = clinical.select(
        "molecular_profile_id", "disease", "doid", "therapies"
    )
    merged = (
        clinical_min.join(mp_variant_map(mps), "molecular_profile_id", "left")
        .join(variant_with_gene, "variant_id", "left")
        .withColumn("doid", normalize_doid(F.col("doid")))
        .withColumn("allele_registry_id", normalize_ca(F.col("_allele_raw")))
    )
    return merged.select(
        "gene_symbol",
        "variant",
        "allele_registry_id",
        "disease",
        F.col("doid"),
        F.col("therapies").alias("therapy"),
        "ncbi_gene_id",
    )


# ---------------------------------------------------------------------------
# Therapy → NCIT enrichment (map_therapy_id_revised.py)
# ---------------------------------------------------------------------------

def combo_tokens(col: Column) -> Column:
    """Multi-separator combo split → canonical tokens, empties dropped
    (map_therapy_id_revised.py:15-49). Parentheticals are stripped from the
    WHOLE string before the split (reference split_tokens_primary:26 does
    the same) — a separator inside '(CDDP, Platinol)' must not fabricate a
    bogus combo; the split then runs on that pre-stripped string (the
    canonicalizer would erase '/', '+', '&' before the split could see
    them); single-token combos fall back to a hyphen split (:36-39)."""
    def canon_all(parts: Column) -> Column:
        # 1-arg lambda required: passing canon_token directly would make
        # F.transform feed the element INDEX into its second parameter
        return F.filter(F.transform(parts, lambda t: canon_token(t)), lambda t: t != "")

    deparen = F.regexp_replace(col, r"\([^)]*\)", "")
    primary = canon_all(F.split(deparen, COMBO_SEP_REGEX))
    hyphen = canon_all(F.split(deparen, r"\s*[-–—]\s*"))
    return F.when(F.size(primary) >= 2, primary).otherwise(
        F.when(F.size(hyphen) >= 2, hyphen).otherwise(primary)
    )


def enrich_therapy_ids(
    bigfile: DataFrame,
    therapy_map: DataFrame,
    therapy_col: str = "therapy",
) -> DataFrame:
    """Attach ``ncit_ids``: exact canonical-combo-key equi-join first
    (J6), per-token lookup with sorted comma re-agg as fallback (J7).

    ``therapy_map`` columns: (therapy, ncit_id) — the reference's
    therapy-name → NCIT CSV."""
    # Combo map from MULTI-drug entries only, token map from SINGLE-agent
    # entries only (map_therapy_id_revised.py:80-104: combo_map filters
    # len(key) >= 2, token_map len(key) == 1) — a lone drug name must never
    # resolve to a combo-regimen NCIT id. Dedup is a deterministic min
    # aggregation (the reference's drop_duplicates keeps first-in-file-order,
    # which is not reproducible under parallel scan; documented deviation).
    mapped = therapy_map.select(
        combo_tokens(F.col("therapy")).alias("_toks"), F.col("ncit_id")
    )
    keyed_map = F.broadcast(
        mapped.filter(F.size("_toks") >= 2)
        .select(canonical_set_key(F.col("_toks")).alias("_combo_key"), "ncit_id")
        .groupBy("_combo_key")
        .agg(F.min("ncit_id").alias("ncit_id"))
    )
    token_map = F.broadcast(
        mapped.filter(F.size("_toks") == 1)
        .select(F.element_at("_toks", 1).alias("_tok"), "ncit_id")
        .groupBy("_tok")
        .agg(F.min("ncit_id").alias("ncit_id"))
    )

    # All joins key on the DETERMINISTIC canonical combo key (never a
    # synthetic monotonically_increasing_id — that is recomputed per
    # execution branch with task-order-dependent values, so a self-join on
    # it silently mismatches under load). The fallback resolves each
    # distinct unmatched key once: the key's '|'-joined parts ARE the
    # canonical token set, so tokens come back out of the key itself.
    with_key = bigfile.withColumn(
        "_combo_key", canonical_set_key(combo_tokens(F.col(therapy_col)))
    )
    exact_map = keyed_map.withColumnRenamed("ncit_id", "_exact_ncit")

    fallback_by_key = (
        with_key.select("_combo_key")
        .distinct()
        .join(exact_map, "_combo_key", "left_anti")
        .select("_combo_key", F.explode(F.split("_combo_key", r"\|")).alias("_tok"))
        .join(token_map, "_tok")
        .groupBy("_combo_key")
        .agg(F.array_join(F.array_sort(F.collect_set("ncit_id")), ",").alias("_tok_ncit"))
    )
    # keyed_map/token_map above are dictionary-scale by contract (the
    # reference's therapy-name→NCIT CSV) so their hints stay; fallback_by_key
    # is CORPUS-influenced — its size is the number of distinct unmatched
    # combo keys observed in the data — so no forced hint: AQE broadcasts it
    # from runtime stats when it actually fits (same reasoning as the
    # hot-shingle set in operators/dedup.py and the measured crossover in
    # jobs/bench_broadcast_crossover.py / hints.py).
    return (
        with_key.join(exact_map, "_combo_key", "left")
        .join(fallback_by_key, "_combo_key", "left")
        .withColumn("ncit_ids", F.coalesce("_exact_ncit", "_tok_ncit"))
        .drop("_combo_key", "_exact_ncit", "_tok_ncit")
    )
