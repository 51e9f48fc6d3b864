"""Local replica of the driver's correctness gate: run every queries() entry
and its DuckDB oracle, compare row count + column names + an
order-insensitive value multiset (exact equality — the driver hashes values,
so near-misses are real failures).

Runs at sf0.01 (the driver's gate scale) AND sf0.001 — a second scale
catches oracles that only match because of size-dependent accidents."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
SF_DIR = SF_DIRS[0]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.01", "sf0.001"])
def sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name, stringify values, return sorted multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            elif v is None:
                vals.append("∅")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, ddb, sf_dir, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0  # rows-only check (driver's weak path)
        return
    res = ddb.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
    assert sn == dn, f"{name}: value mismatch, first diffs: {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["predicate", "object", "n_triples"]
