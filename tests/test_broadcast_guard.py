"""Size-guarded broadcast hints: plan shape flips past the bound, results
do not (VERDICT r3 "What's wrong" #1/#2 closure).

The norm map / canonical-id set used to be FORCED ``F.broadcast`` with no
size guard — fine for dictionary-scale lexicons, unbounded for a 100×
entity universe. ``hints.guarded_broadcast`` drops the hint past a measured
row bound; these tests prove (a) the hint actually disappears from the plan
past the bound, (b) both plan shapes produce identical rows, including a
full pipeline run with the threshold forced to 0.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from adding_datasets_to_kg_spark import hints
from adding_datasets_to_kg_spark.operators.canonicalize import remap_edge_endpoints
from adding_datasets_to_kg_spark.operators.merge import (
    dedup_edges_targeted,
    merge_nodes_targeted,
)


def _norm_map(spark):
    rows = [("A", "A"), ("B", "A"), ("C", "C")]
    return spark.createDataFrame(rows, "id string, canonical_id string").localCheckpoint(
        eager=True
    )


def _edges(spark):
    rows = [
        ("B", "rel", "C", "src", None),
        ("A", "rel", "X", "src", None),
        ("X", "rel", "Y", "src", None),
    ]
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, "
        "primary_knowledge_source string, properties map<string,string>",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_remap_hint_present_within_bound_and_dropped_past_it(spark):
    nm, e = _norm_map(spark), _edges(spark)
    hinted = remap_edge_endpoints(e, nm, norm_map_rows=3)
    unhinted = remap_edge_endpoints(e, nm, norm_map_rows=hints.MAX_BROADCAST_HINT_ROWS + 1)
    # localCheckpointed maps have no stats → without the hint the initial
    # physical plan is sort-merge; with it, broadcast-hash
    assert "BroadcastHashJoin" in _plan(hinted)
    assert "SortMergeJoin" in _plan(unhinted)
    key = lambda r: (r.subject, r.predicate, r.object)  # noqa: E731
    assert sorted(map(key, hinted.collect())) == sorted(map(key, unhinted.collect()))


def test_targeted_operators_equal_with_threshold_zero(spark, monkeypatch):
    nm, e = _norm_map(spark), _edges(spark)
    canon = nm.select(F.col("canonical_id").alias("id"))
    nodes = spark.createDataFrame(
        [("A", "a", None, None), ("B", None, None, None), ("X", "x", None, None)],
        "id string, name string, category array<string>, properties map<string,string>",
    )
    base_nodes = sorted(
        (r.id, r.name) for r in merge_nodes_targeted(nodes, canon, maybe_dup_rows=2).collect()
    )
    base_edges = sorted(
        (r.subject, r.object)
        for r in dedup_edges_targeted(e, canon, endpoint_rows=2).collect()
    )
    monkeypatch.setattr(hints, "MAX_BROADCAST_HINT_ROWS", 0)
    guard_nodes = sorted(
        (r.id, r.name) for r in merge_nodes_targeted(nodes, canon, maybe_dup_rows=2).collect()
    )
    guard_edges = sorted(
        (r.subject, r.object)
        for r in dedup_edges_targeted(e, canon, endpoint_rows=2).collect()
    )
    assert base_nodes == guard_nodes
    assert base_edges == guard_edges


def test_pipeline_identical_with_threshold_zero(spark, monkeypatch):
    """Full transcript pipeline, hint threshold forced to 0 (every guarded
    broadcast degrades to AQE choice): node and edge outputs are identical
    row-for-row to the default run."""
    from adding_datasets_to_kg_spark.datagen.transcripts import (
        disease_lexicon_df,
        gene_lexicon_df,
        generate_transcripts_distributed,
        id_equivalences_df,
        predicate_map_df,
        variant_lexicon_df,
    )
    from adding_datasets_to_kg_spark.plans.pipeline import Lexicons, run_pipeline

    lex = Lexicons(
        gene=gene_lexicon_df(spark),
        disease=disease_lexicon_df(spark),
        variant=variant_lexicon_df(spark),
        id_equivalences=id_equivalences_df(spark),
        predicate_map=predicate_map_df(spark),
    )
    transcripts = generate_transcripts_distributed(spark, 40, 10)

    def snapshot():
        out = run_pipeline(transcripts, lex, compute_metadata=False)
        nodes = sorted((r.id, r.name) for r in out["nodes"].collect())
        edges = sorted(
            (r.subject, r.predicate, r.object) for r in out["edges"].collect()
        )
        return nodes, edges

    base = snapshot()
    monkeypatch.setattr(hints, "MAX_BROADCAST_HINT_ROWS", 0)
    guarded = snapshot()
    assert base == guarded
