"""Property test: driver union-find labeling equals brute-force reachability
on random graphs (no Spark involved — the distributed path is pinned equal to
the driver path in test_kg_pipeline.py::test_connected_components_strategies_agree)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from adding_datasets_to_kg_spark.operators.canonicalize import _driver_union_find


def brute_components(pairs):
    nodes = {x for p in pairs for x in p if x is not None}
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        if a is not None and b is not None:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    seen = set()
    for start in nodes:
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x])
        m = min(comp)
        for x in comp:
            out[x] = m
        seen |= comp
    return out


node = st.integers(min_value=0, max_value=40).map(lambda i: f"n{i:02d}")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(node, node), max_size=80))
def test_union_find_matches_reachability(pairs):
    got = dict(_driver_union_find(pairs))
    want = brute_components(pairs)
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(node, node), max_size=60), st.randoms())
def test_union_find_order_invariant(pairs, rng):
    shuffled = list(pairs)
    rng.shuffle(shuffled)
    assert dict(_driver_union_find(pairs)) == dict(_driver_union_find(shuffled))
