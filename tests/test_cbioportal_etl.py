"""cBioPortal preprocessing chain (extract_gene_study_chr.py semantics)."""

from adding_datasets_to_kg_spark.sources.cbioportal_etl import extract_gene_study_chr


def test_extract_gene_study_chr(spark):
    mutations = spark.createDataFrame(
        [
            (7157, "brca_tcga", "17", "extra"),
            (7157, "brca_tcga", "17", "dup-row"),        # dedup target
            (673, "skcm_tcga", "7", None),
            (673, "mystery_study", "7", None),           # unmapped study
            (None, "brca_tcga", "1", None),              # missing gene → dropped
            (1956, None, "7", None),                     # missing study → dropped
            (3845, "paad_tcga", "", None),               # empty chr → dropped
            (99999, "brca_tcga", "2", None),             # no symbol → ENTREZ: fallback
        ],
        "entrezGeneId long, studyId string, chr string, junk string",
    )
    study_map = spark.createDataFrame(
        [("brca_tcga", "DOID:1612"), ("skcm_tcga", "DOID:1909"), ("paad_tcga", "DOID:1793")],
        "study_id string, doid string",
    )
    symbols = spark.createDataFrame(
        [(7157, "TP53"), (673, "BRAF")], "entrez_gene_id long, symbol string"
    )

    records, unmapped = extract_gene_study_chr(mutations, study_map, symbols)
    rows = {tuple(r) for r in records.collect()}
    assert rows == {
        (7157, "TP53", "17", "DOID:1612"),
        (673, "BRAF", "7", "DOID:1909"),
        (99999, "ENTREZ:99999", "2", "DOID:1612"),
    }
    assert {r["study_id"] for r in unmapped.collect()} == {"mystery_study"}


def test_extract_without_symbol_table(spark):
    mutations = spark.createDataFrame(
        [(673, "skcm_tcga", "7")], "entrezGeneId long, studyId string, chr string"
    )
    study_map = spark.createDataFrame(
        [("skcm_tcga", "DOID:1909")], "study_id string, doid string"
    )
    records, _ = extract_gene_study_chr(mutations, study_map, gene_symbols=None)
    assert [tuple(r) for r in records.collect()] == [
        (673, "ENTREZ:673", "7", "DOID:1909")
    ]
