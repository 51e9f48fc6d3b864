#!/usr/bin/env python
"""Regenerate tests/golden_graph_metadata.json — the committed golden
metadata artifact for the fixed fixture corpus (n_convs=40, seed=7; the
same corpus the oracle P/R test pins).

The reference's de-facto golden artifact is the committed KG summary
(/root/reference/docs/04_MIDAS_KNOWLEDGE_GRAPH_SUMMARY.md:12-16 — exact
node/edge/per-category counts for a released graph build); this file plays
the same role for our pipeline: any change to extraction, linking,
canonicalization, or merge semantics shows up as a metadata diff and must
be re-blessed explicitly by re-running this script.

    python jobs/gen_golden_metadata.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "golden_graph_metadata.json")


def compute_metadata() -> dict:
    from adding_datasets_to_kg_spark.datagen import transcripts as dg
    from adding_datasets_to_kg_spark.operators.stats import graph_metadata
    from adding_datasets_to_kg_spark.plans.pipeline import Lexicons, run_pipeline
    from adding_datasets_to_kg_spark.session import get_spark

    spark = get_spark("gen-golden-metadata", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        dg.generate_corpus(n_convs=40, seed=7), dg.TRANSCRIPT_SCHEMA
    )
    lex = Lexicons(
        gene=dg.gene_lexicon_df(spark),
        disease=dg.disease_lexicon_df(spark),
        variant=dg.variant_lexicon_df(spark),
        id_equivalences=dg.id_equivalences_df(spark),
        predicate_map=dg.predicate_map_df(spark),
    )
    out = run_pipeline(corpus, lex, compute_metadata=False)
    return graph_metadata(out["nodes"], out["edges"])


def main() -> None:
    meta = compute_metadata()
    with open(GOLDEN, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {GOLDEN}")
    print(json.dumps(meta, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
