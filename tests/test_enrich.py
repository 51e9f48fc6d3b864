"""Batched-enrichment shim (S5/U4): resolver must be called per id-BATCH,
never per row — proven observably, since resolver calls happen in executor
worker processes where driver-side counters can't see them."""

from pyspark.sql import functions as F

from adding_datasets_to_kg_spark.operators.enrich import dictionary_resolver, enrich_batched


def _witness_resolver(ids: list) -> dict:
    # encode the batch size into every value: one resolver call per batch
    # means all ids of that batch carry the same suffix
    return {i: f"sym{i}|{len(ids)}" for i in ids}


def test_enrich_batched_is_batch_granular(spark):
    df = spark.createDataFrame(
        [(i % 40,) for i in range(400)], "entrez long"
    ).repartition(2)
    out = enrich_batched(df, "entrez", _witness_resolver, batch_size=10).collect()
    assert len(out) == 400
    for r in out:
        val, claimed = r.enriched.split("|")
        assert val == f"sym{r.entrez}"
        # the resolver saw a real batch (len == batch_n_ids witness column),
        # bounded by batch_size and bigger than a per-row call
        assert int(claimed) == r.batch_n_ids
        assert 1 < r.batch_n_ids <= 10


def test_enrich_batched_respects_distinct_id_budget(spark):
    """batch_size counts DISTINCT ids — duplicated ids ride along in the
    same resolver call (the reference batches the id SET, not rows)."""
    df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 50, "k long").coalesce(1)
    out = enrich_batched(df, "k", _witness_resolver, batch_size=5)
    assert out.select(F.max("batch_n_ids")).first()[0] <= 5
    # 100 rows but only 2 distinct ids → a single resolver call serves all
    assert out.select(F.countDistinct("batch_n_ids")).first()[0] == 1
    assert out.first().batch_n_ids == 2


def test_dictionary_resolver_default(spark):
    """Offline default mirrors running from pre-downloaded mapping files
    (extract_gene_study_chr.py:48-94 with cached MyGene output)."""
    df = spark.createDataFrame([(7157,), (673,), (999,)], "entrez long")
    resolver = dictionary_resolver({7157: "TP53", 673: "BRAF"})
    rows = {r.entrez: r.enriched for r in enrich_batched(df, "entrez", resolver).collect()}
    assert rows == {7157: "TP53", 673: "BRAF", 999: None}
