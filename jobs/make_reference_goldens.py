#!/usr/bin/env python
"""Derive golden KGX outputs from the reference's own bundled data files.

A pure-Python, line-faithful re-execution of the reference's converter loops
(/root/reference/src/midas/convert_data.py:11-56 for CIViC,
:84-117 for 1000-Genomes, with util.py:30-49 format_hgvsg /
get_consequence_predicate), run over the two data files the reference
actually ships:

- data/CIViC/variant_gene_disease_therapy_with_normIDs.tsv  (5,122 rows)
- data/1kg/1kg_test2.json                                    (30 records)

KGXFileWriter semantics reproduced: node writes are first-id-wins
(repeat ids skipped), edge writes are append-per-call [ORION, public].

Output: tests/golden_reference_data.json — order-independent invariants
(node id sets hashed, per-predicate edge counts, full edge-multiset hash,
unambiguous-name spot rows) that tests/test_reference_goldens.py checks the
Spark converters against. Run once; the JSON is committed.
"""

from __future__ import annotations

import csv
import hashlib
import json
import os
import sys

REF = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
CIVIC_TSV = os.path.join(REF, "data/CIViC/variant_gene_disease_therapy_with_normIDs.tsv")
ONEKG_JSON = os.path.join(REF, "data/1kg/1kg_test2.json")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "golden_reference_data.json")

SEQUENCE_VARIANT = "biolink:SequenceVariant"
DISEASE = "biolink:Disease"
GENE = "biolink:Gene"


class Writer:
    """KGXFileWriter stand-in: first-wins node dedup, append edges."""

    def __init__(self) -> None:
        self.nodes: dict[str, dict] = {}
        self.edges: list[dict] = []

    def write_node(self, node_id, node_name="", node_types=None, node_properties=None):
        if node_id in self.nodes:
            return
        self.nodes[node_id] = {
            "id": node_id,
            "name": node_name,
            "category": node_types,
            "properties": node_properties,
        }

    def write_edge(self, subject_id, predicate, object_id,
                   primary_knowledge_source, edge_properties=None):
        self.edges.append({
            "subject": subject_id,
            "predicate": predicate,
            "object": object_id,
            "primary_knowledge_source": primary_knowledge_source,
            "properties": edge_properties,
        })


def convert_civic(path: str) -> Writer:
    """convert_data.py:11-56, verbatim control flow."""
    w = Writer()
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            variant_id = row["allele_registry_id"]
            variant_name = row["variant"]
            disease_id = row["doid"]
            disease_name = row["disease"]
            gene_id = row["ncbi_gene_id"]
            gene_symbol = row["gene_symbol"]
            therapy_ids = row["ncit_ids"].split(",")
            if variant_id and "unrecognized" not in variant_name:
                w.write_node(variant_id, variant_name, [SEQUENCE_VARIANT])
            if disease_id:
                w.write_node(disease_id, disease_name, [DISEASE])
            if variant_id and disease_id and "CAID:" in variant_id:
                w.write_edge(variant_id, "biolink:genetically_associated_with",
                             disease_id, "infores:civic")
            for therapy_id in therapy_ids:
                if therapy_id and disease_id:
                    therapy_id = f"NCIT:{therapy_id}"
                    w.write_node(therapy_id, "")
                    w.write_edge(therapy_id, "biolink:applied_to_treat",
                                 disease_id, "infores:civic")
            if variant_id and gene_id:
                w.write_node(gene_id, gene_symbol)
                w.write_edge(variant_id, "biolink:is_sequence_variant_of",
                             gene_id, "infores:civic")
    return w


def format_hgvsg(hgvsg, spdi):
    """util.py:30-36."""
    if hgvsg.startswith("NC_"):
        return f"HGVS:{hgvsg}"
    spdi_contig = spdi.split(":")[0]
    hgvsg_contig = hgvsg.split(":")[1:]
    return f"HGVS:{spdi_contig}:{':'.join(hgvsg_contig)}"


def get_consequence_predicate(so_term):
    """util.py:38-49."""
    return {
        "splice_region_variant": "biolink:splice_site_variant_of",
        "splice_polymiridine_variant": "biolink:is_splice_site_variant_of",
        "frameshift_variant": "biolink:is_frameshift_variant_of",
        "missense_variant": "biolink:is_missense_variant_of",
        "protein_altering_variant": "biolink:protein_altering_variant",
        "synonymous_variant": "biolink:is_synonymous_variant_of",
        "intron_variant": "biolink:is_non_coding_variant_of",
    }.get(so_term, "biolink:is_molecular_consequence_of")


def convert_1kg(path: str) -> Writer:
    """convert_data.py:84-117, verbatim control flow."""
    w = Writer()
    with open(path) as f:
        for line in f:
            variant_obj = json.loads(line)
            if "transcript_consequences" not in variant_obj:
                continue
            variant_id = next(
                (format_hgvsg(tc["hgvsg"], tc["spdi"])
                 for tc in variant_obj["transcript_consequences"]
                 if "hgvsg" in tc and "spdi" in tc),
                None,
            )
            gene_id = next(
                (f"NCBIGene:{tc['gene_id']}"
                 for tc in variant_obj["transcript_consequences"]),
                None,
            )
            if variant_id:
                frequency_list = variant_obj["input"].split()[-1].split(";")
                msc = f"{variant_obj['most_severe_consequence']}"
                freqs = {}
                for frequency in frequency_list:
                    for pop in ("AFR", "AMR", "EAS", "EUR", "SAS"):
                        if frequency.startswith(f"{pop}="):
                            freqs[pop] = frequency.split("=")[1]
                w.write_node(variant_id, node_types=[SEQUENCE_VARIANT],
                             node_properties=freqs)
                w.write_node(gene_id, node_types=[GENE])
                w.write_edge(variant_id, get_consequence_predicate(msc), gene_id,
                             primary_knowledge_source="infores:1000genomes",
                             edge_properties={"most_severe_consequence": msc})
    return w


def _sha(items) -> str:
    return hashlib.sha256("\n".join(sorted(items)).encode()).hexdigest()[:16]


def summarize(w: Writer) -> dict:
    ids = sorted(w.nodes)
    by_prefix: dict[str, int] = {}
    for i in ids:
        by_prefix[i.split(":", 1)[0]] = by_prefix.get(i.split(":", 1)[0], 0) + 1
    preds: dict[str, int] = {}
    for e in w.edges:
        preds[e["predicate"]] = preds.get(e["predicate"], 0) + 1
    # spot rows: ids whose name is unambiguous across ALL writes are safe to
    # compare against an order-independent dedup (first-wins vs merge pick)
    return {
        "n_nodes": len(ids),
        "node_ids_sha": _sha(ids),
        "nodes_by_prefix": dict(sorted(by_prefix.items())),
        "n_edges": len(w.edges),
        "edges_by_predicate": dict(sorted(preds.items())),
        "edge_multiset_sha": _sha(
            f"{e['subject']}\t{e['predicate']}\t{e['object']}\t{e['primary_knowledge_source']}"
            for e in w.edges
        ),
    }


def main() -> None:
    civic = convert_civic(CIVIC_TSV)
    onekg = convert_1kg(ONEKG_JSON)

    golden = {"civic": summarize(civic), "onekg": summarize(onekg)}

    # CIViC spot rows: 3 deterministic ids per prefix (lowest sorted) + name
    spots = {}
    for i in sorted(civic.nodes)[:3] + sorted(civic.nodes)[-3:]:
        spots[i] = civic.nodes[i]["name"]
    golden["civic"]["spot_first_wins_names"] = spots

    # 1kg spot rows: every variant node id + its frequency map (30 records)
    golden["onekg"]["variant_frequencies"] = {
        i: n["properties"] for i, n in sorted(civic.nodes.items()) if False
    }
    golden["onekg"]["variant_frequencies"] = {
        i: n["properties"]
        for i, n in sorted(onekg.nodes.items())
        if n["category"] == [SEQUENCE_VARIANT]
    }
    golden["onekg"]["edge_properties_msc"] = sorted(
        f"{e['subject']}\t{e['properties']['most_severe_consequence']}"
        for e in onekg.edges
    )

    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if not isinstance(vv, (dict, list)) or kk in
                          ("nodes_by_prefix", "edges_by_predicate")}
                      for k, v in golden.items()}, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
