"""KGX JSONL + typed-CSV sink roundtrips (S6/S7/S8 in SURVEY.md §2.1)."""

import csv
import glob

from adding_datasets_to_kg_spark.sources.kgx import (
    conform_edges,
    conform_nodes,
    export_typed_csv,
    read_kgx_jsonl,
    write_kgx_jsonl,
)


def _sample(spark):
    nodes = conform_nodes(spark.createDataFrame(
        [("A", "alpha", ["biolink:Gene"], {"k": "v"}),
         ("A", "alpha-longer-name", ["biolink:NamedThing"], None),  # dup id
         ("B", None, ["biolink:Disease"], None)],
        "id string, name string, category array<string>, properties map<string,string>",
    ))
    edges = conform_edges(spark.createDataFrame(
        [("A", "biolink:affects", "B", "infores:t", {"p": "1"})],
        "subject string, predicate string, object string, "
        "primary_knowledge_source string, properties map<string,string>",
    ))
    return nodes, edges


def test_kgx_jsonl_roundtrip_with_node_dedup(spark, tmp_path):
    nodes, edges = _sample(spark)
    np, ep = str(tmp_path / "nodes"), str(tmp_path / "edges")
    write_kgx_jsonl(nodes, edges, np, ep)
    rn, re_ = read_kgx_jsonl(spark, np, ep)
    rows = {r["id"]: r for r in rn.collect()}
    assert set(rows) == {"A", "B"}  # writer-side dedup (S6/A4)
    assert rows["A"]["name"] == "alpha"  # deterministic min-name winner
    assert rows["A"]["category"] == ["biolink:Gene", "biolink:NamedThing"]
    e = re_.collect()
    assert len(e) == 1 and e[0]["subject"] == "A" and e[0]["properties"] == {"p": "1"}


def test_typed_csv_export_headers(spark, tmp_path):
    nodes, edges = _sample(spark)
    np, ep = str(tmp_path / "ncsv"), str(tmp_path / "ecsv")
    export_typed_csv(nodes, edges, np, ep, infer_properties=False)
    def rows_of(dir_path):
        out = []
        for part in sorted(glob.glob(f"{dir_path}/part-*.csv")):
            with open(part) as f:
                rows = list(csv.reader(f))
            if rows:
                assert rows[0] == header_of[dir_path]  # every part repeats the header
                out.extend(rows[1:])
        return out

    header_of = {
        np: ["id:ID", "name:string", "category:LABEL", "properties:string"],
        ep: ["subject:START_ID", "predicate:TYPE", "object:END_ID",
             "primary_knowledge_source:string", "properties:string"],
    }
    nrows = rows_of(np)
    assert {r[0] for r in nrows} >= {"A", "B"}
    erows = rows_of(ep)
    assert erows and erows[0][0] == "A" and erows[0][2] == "B"


def test_typed_csv_property_inference(spark, tmp_path):
    """ORION 2-pass conversion: per-property typed columns discovered from
    the data (fix_golden_kg_v2_format.py:29-85 header conventions)."""
    from adding_datasets_to_kg_spark.sources.kgx import infer_property_types, nodes_to_typed_csv_df

    nodes = conform_nodes(spark.createDataFrame(
        [("A", "alpha", ["biolink:Gene"],
          {"information_content": "82.5", "equivalent_identifiers": "X:1;Y:2", "note": "free text"}),
         ("B", "beta", ["biolink:Disease"],
          {"information_content": "14", "equivalent_identifiers": "Z:9", "note": "7seven"})],
        "id string, name string, category array<string>, properties map<string,string>",
    ))
    types = infer_property_types(nodes)
    assert types == {
        "information_content": "float",        # every value casts to double
        "equivalent_identifiers": "string[]",  # ';' present in ≥1 value
        "note": "string",                      # '7seven' does not cast
    }
    df = nodes_to_typed_csv_df(nodes, property_types=types)
    assert df.columns == [
        "id:ID", "name:string", "category:LABEL",
        "equivalent_identifiers:string[]", "information_content:float", "note:string",
    ]
    rows = {r["id:ID"]: r for r in df.collect()}
    assert rows["A"]["information_content:float"] == 82.5  # typed, not a string
    assert rows["A"]["equivalent_identifiers:string[]"] == "X:1;Y:2"
    assert rows["B"]["note:string"] == "7seven"
