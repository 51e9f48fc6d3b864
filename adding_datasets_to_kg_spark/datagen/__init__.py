"""Deterministic synthetic fixtures (FIXTURES.md): transcript corpus,
lexicon/dictionary tables, id-equivalence cliques, predicate map."""
