"""CIViC preprocessing ETL chain (reference extract_civic_data.py +
map_therapy_id_revised.py semantics) over synthesized raw fixtures."""

import pytest
from pyspark.sql import functions as F

from adding_datasets_to_kg_spark.sources.civic_etl import (
    enrich_therapy_ids,
    extract_civic_bigfile,
    mp_variant_map,
    normalize_doid,
    normalize_ncbi_gene,
    parse_list_like,
)


@pytest.fixture(scope="module")
def raw(spark):
    clinical = spark.createDataFrame(
        [
            (100, "melanoma", "1909", "Dabrafenib and Trametinib"),
            (101, "lung cancer", "DOID:1324", "Erlotinib"),
            (102, "glioma", "bogus", "Unknownium"),
            (103, "breast cancer", "1612.0", "Cisplatin / Pemetrexed"),
        ],
        "molecular_profile_id long, disease string, doid string, therapies string",
    )
    mps = spark.createDataFrame(
        [
            (100, "[1, 2]"),          # literal list
            (101, "3"),               # scalar
            (102, "4, bad, 5"),       # comma fallback w/ junk token
            (103, None),              # null → no variants
        ],
        "molecular_profile_id long, variant_ids string",
    )
    variants = spark.createDataFrame(
        [
            (1, "V600E", 10, "673", "CA123643"),
            (2, "V600K", 10, "673", None),
            (3, "T790M", 11, "1956.0", "CA000001"),
            (4, "R132H", 12, "not-a-number", "CA999"),
            (5, "G12D", 13, "NCBIGene:3845", "CA126713"),
        ],
        "variant_id long, variant string, feature_id long, entrez_id string, allele_registry_id string",
    )
    features = spark.createDataFrame(
        [(10, "BRAF"), (11, "EGFR"), (12, "IDH1"), (13, "KRAS")],
        "feature_id long, name string",
    )
    return clinical, mps, variants, features


def test_parse_list_like_variants(spark):
    df = spark.createDataFrame(
        [("[1, 2]",), ("3",), ("4, bad, 5",), (None,), ("nan",)], "v string"
    ).select(parse_list_like(F.col("v")).alias("a"))
    got = [r["a"] for r in df.collect()]
    assert got[0] == ["1", "2"]
    assert got[1] == ["3"]
    assert got[2] == ["4", "bad", "5"]
    assert got[3] == [] and got[4] == []


def test_mp_variant_map_coerce_dedup(raw):
    _, mps, _, _ = raw
    rows = {(r["molecular_profile_id"], r["variant_id"])
            for r in mp_variant_map(mps).collect()}
    assert rows == {(100, 1), (100, 2), (101, 3), (102, 4), (102, 5)}  # 'bad' dropped


def test_bigfile_chain(raw):
    bigfile = extract_civic_bigfile(*raw)
    rows = {(r["variant"], r["gene_symbol"], r["doid"], r["allele_registry_id"],
             r["ncbi_gene_id"]) for r in bigfile.collect()}
    # doid numeric coerce, incl. float-string; bogus → null
    assert ("V600E", "BRAF", "DOID:1909", "CAID:CA123643", "NCBIGene:673") in rows
    assert ("T790M", "EGFR", "DOID:1324", "CAID:CA000001", "NCBIGene:1956") in rows
    assert ("R132H", "IDH1", None, "CAID:CA999", None) in rows  # both normalizers null
    # variant 5 rides mp 102 (glioma): bogus doid → null, prefixed entrez kept
    assert ("G12D", "KRAS", None, "CAID:CA126713", "NCBIGene:3845") in rows
    # left-join preservation: mp 103 row survives with null variant side
    assert any(r[0] is None for r in rows)


def test_therapy_enrichment_exact_and_token_fallback(spark, raw):
    bigfile = extract_civic_bigfile(*raw)
    tmap = spark.createDataFrame(
        [
            ("Trametinib and Dabrafenib", "C82386-C77908"),  # order-insensitive exact
            ("Erlotinib", "C65530"),
            ("Cisplatin", "C376"),
            ("Pemetrexed", "C61614"),
        ],
        "therapy string, ncit_id string",
    )
    out = enrich_therapy_ids(bigfile, tmap)
    by_therapy = {r["therapy"]: r["ncit_ids"] for r in out.collect()}
    # exact combo-key match despite reversed order
    assert by_therapy["Dabrafenib and Trametinib"] == "C82386-C77908"
    assert by_therapy["Erlotinib"] == "C65530"
    # no exact combo entry → per-token fallback, sorted comma join
    assert by_therapy["Cisplatin / Pemetrexed"] == "C376,C61614"
    assert by_therapy["Unknownium"] is None


def test_therapy_stopwords_and_single_agent_map(spark, raw):
    """map_therapy_id_revised.py:20-21,46,80-104 parity: therapy stopwords
    are stripped anywhere, and the token map is built ONLY from single-agent
    entries, so a lone drug name can never inherit a combo-regimen id."""
    tmap = spark.createDataFrame(
        [
            ("Tamoxifen", "C855"),
            ("Tamoxifen and Cisplatin", "C9999"),  # combo entry shares the token
            ("Cisplatin", "C376"),
        ],
        "therapy string, ncit_id string",
    )
    bigfile = spark.createDataFrame(
        [("Tamoxifen therapy",), ("Tamoxifen regimen",), ("Cisplatin with Tamoxifen",),
         ("Tamoxifen",)],
        "therapy string",
    )
    out = {r["therapy"]: r["ncit_ids"] for r in enrich_therapy_ids(bigfile, tmap).collect()}
    # stopword stripped → matches the single-agent entry, not the combo
    assert out["Tamoxifen therapy"] == "C855"
    assert out["Tamoxifen regimen"] == "C855"
    assert out["Tamoxifen"] == "C855"
    # order-insensitive combo key still wins for real combos
    assert out["Cisplatin with Tamoxifen"] == "C9999"


def test_parenthetical_stripped_before_combo_split(spark):
    """map_therapy_id_revised.py:26 parity: '(CDDP, Platinol)' must not
    fabricate a combo — parentheticals are removed before the separator
    split sees their commas."""
    tmap = spark.createDataFrame([("Cisplatin", "C376")], "therapy string, ncit_id string")
    bigfile = spark.createDataFrame(
        [("Cisplatin (CDDP, Platinol)",)], "therapy string"
    )
    out = enrich_therapy_ids(bigfile, tmap).collect()
    assert out[0]["ncit_ids"] == "C376"


def test_parse_list_like_python_repr_quotes(spark):
    """extract_civic_data.py:16-28 parity: ast.literal_eval accepts
    Python-repr lists ("['12', '13']"); the Spark fallback must strip the
    single quotes, not leave ids that fail numeric coercion."""
    from adding_datasets_to_kg_spark.sources.civic_etl import parse_list_like
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("['12', '13']",), ('["7", "8"]',), ("[1, 2]",), ("9",), (None,)],
        "v string",
    )
    rows = df.select(parse_list_like(F.col("v")).alias("p")).collect()
    assert [r.p for r in rows] == [["12", "13"], ["7", "8"], ["1", "2"], ["9"], []]
