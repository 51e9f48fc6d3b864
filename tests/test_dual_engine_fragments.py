"""Fuzz-parity for the dual-engine expression fragments that back the
hash-checked oracle registry: the Spark expression and its DuckDB SQL
replica must agree not just on the registry's constructed inputs but on an
adversarial generated domain (separators, parentheticals, stopwords, case,
punctuation, empty tokens).

Found in anger: DuckDB's ``array_to_string([], sep)`` is NULL where Spark's
``array_join([], sep)`` is ``''`` — an all-stopword therapy string would
have keyed differently in the two engines (entry_queries._SQL_COMBO_KEY now
coalesces).
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from adding_datasets_to_kg_spark.functions.text import canonical_set_key, tokens
from adding_datasets_to_kg_spark.plans.entry_queries import (
    _SQL_COMBO_KEY,
    _sql_combo_toks,
    _sql_toks,
)
from adding_datasets_to_kg_spark.sources.civic_etl import combo_tokens

WORDS = [
    "tamoxifen", "Cisplatin", "5-FU", "nab-paclitaxel", "FOLFIRINOX", "a",
    "therapy", "Regimen", "combination", "with", "AND", "x+y",
    "(CDDP, Platinol)", "",
]
SEPS = [" / ", ", ", "; ", " + ", " & ", " and ", " with ", " - ", "-", " – ", "  "]


def gen_strings(seed: int, n: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)

    def one() -> str:
        parts = [rng.choice(WORDS) for _ in range(rng.randint(1, 4))]
        s = parts[0]
        for p in parts[1:]:
            s += rng.choice(SEPS) + p
        if rng.random() < 0.3:
            s = s + " (" + rng.choice(WORDS) + ")"
        if rng.random() < 0.2:
            s = "  " + s + "  "
        if rng.random() < 0.15:
            s = s.upper()
        if rng.random() < 0.1:
            s += rng.choice(["!", "?", ".", ",", ";", "/"])
        return s

    return [(i, one()) for i in range(n)]


@pytest.fixture(scope="module")
def fuzz_rows():
    return gen_strings(seed=42, n=400)


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return con


def test_combo_key_fragment_parity(spark, fuzz_rows):
    """combo_tokens + canonical_set_key vs the _sql_combo_toks/_SQL_COMBO_KEY
    replica (the etl_therapy_enrich join keys on both sides)."""
    df = spark.createDataFrame(fuzz_rows, "i int, s string")
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i", canonical_set_key(combo_tokens(F.col("s"))).alias("k")
        ).collect()
    }
    key = _SQL_COMBO_KEY.format(toks=_sql_combo_toks("s"))
    want = dict(_duck(fuzz_rows).execute(f"SELECT i, {key} FROM t").fetchall())
    bad = [(i, s, got[i], want[i]) for i, s in fuzz_rows if got[i] != want[i]]
    assert not bad, bad[:5]


def test_whitespace_tokens_fragment_parity(spark, fuzz_rows):
    """tokens() vs SQL_TOKS (the shared tokenizer under text_quality,
    j_canonical_key_join, j_token_explode_reagg, the shingle family)."""
    df = spark.createDataFrame(fuzz_rows, "i int, s string")
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i", F.coalesce(F.array_join(tokens("s"), "\x01"), F.lit("")).alias("k")
        ).collect()
    }
    sql = f"SELECT i, coalesce(array_to_string({_sql_toks('s')}, chr(1)), '') FROM t"
    want = dict(_duck(fuzz_rows).execute(sql).fetchall())
    bad = [(i, s, got[i], want[i]) for i, s in fuzz_rows if got[i] != want[i]]
    assert not bad, bad[:5]


def test_langid_trigram_rounding_boundary_fixture(spark, tmp_path):
    """Pin the documented text_langid boundary semantics (entry docstring):
    lang_ngram thresholds the 4-dp ROUNDED tri_ratio, so a doc with raw
    ratio in [0.03995, 0.04) rounds to 0.0400 and labels 'en' where an
    exact comparison would say 'unknown' — and BOTH engines agree on it.

    Fixture docs are 'the'+filler constructions where the hit count and
    slot count are exact by arithmetic (no profile trigram other than
    'the' can occur in a {t,h,e,q}-alphabet, whitespace-free string):
      doc 0: 399 hits / 9980 slots = 0.0399799  -> rounds 0.0400 -> 'en'
      doc 1: 399 hits / 10000 slots = 0.0399    -> 'unknown'
      doc 2: 4 hits / 100 slots = 0.04 exactly  -> 'en'
    """
    from adding_datasets_to_kg_spark.plans.entry_queries import ORACLES, QUERIES

    unit = "the" + "q" * 22  # 25 chars, exactly one profile-trigram hit
    docs = [
        (0, unit * 399 + "q" * 7),   # len 9982 -> 9980 slots, 399 hits
        (1, unit * 399 + "q" * 27),  # len 10002 -> 10000 slots, 399 hits
        (2, unit * 4 + "qq"),        # len 102 -> 100 slots, 4 hits
    ]
    # the documented flip regime really is exercised by doc 0
    assert 0.03995 <= 399 / 9980 < 0.04

    pq = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(pq)

    got = {
        r["doc_id"]: (f"{r['tri_ratio']:.4f}", r["lang_ngram"], r["lang_stopword"])
        for r in QUERIES["text_langid"](spark, str(tmp_path)).collect()
    }
    assert got[0] == ("0.0400", "en", "unknown")       # rounded-up boundary doc
    assert got[1] == ("0.0399", "unknown", "unknown")
    assert got[2] == ("0.0400", "en", "unknown")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = {
        row[0]: (f"{row[2]:.4f}", row[3], row[1])
        for row in con.execute(
            "SELECT doc_id, lang_stopword, tri_ratio, lang_ngram FROM ("
            + ORACLES["text_langid"] + ")"
        ).fetchall()
    }
    assert got == want
