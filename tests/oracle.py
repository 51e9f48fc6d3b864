"""Pure-Python reference implementation of the transcript→triple semantics.

Independent of the Spark code paths (no imports from the engine's operators
beyond the static lexicon fixtures): mirrors the MIDAS operator semantics the
engine re-creates — mention detection with the "unrecognized" negative
(/root/reference/src/midas/convert_data.py:28), consequence-predicate decode
(/root/reference/src/midas/util.py:38-49), clique canonicalization
(normalize.py semantics), and the triple-family emission rules. Used to score
the engine at P/R ≥ 0.95 (exact match expected at this scale).
"""

from __future__ import annotations

import re

from adding_datasets_to_kg_spark.datagen.transcripts import DISEASES, GENES, VARIANTS

TOKEN_RE = re.compile(r"[A-Za-z0-9_:.>\-]+")

SO_TO_PRED = {
    "splice_region_variant": "biolink:splice_site_variant_of",
    "splice_polymiridine_variant": "biolink:is_splice_site_variant_of",
    "frameshift_variant": "biolink:is_frameshift_variant_of",
    "missense_variant": "biolink:is_missense_variant_of",
    "protein_altering_variant": "biolink:protein_altering_variant",
    "synonymous_variant": "biolink:is_synonymous_variant_of",
    "intron_variant": "biolink:is_non_coding_variant_of",
}
DEFAULT_PRED = "biolink:is_molecular_consequence_of"


def build_dictionary() -> dict[tuple[str, ...], list[tuple[str, str]]]:
    table: dict[tuple[str, ...], set[tuple[str, str]]] = {}

    def add(term: str, eid: str, etype: str) -> None:
        key = tuple(t.lower() for t in TOKEN_RE.findall(term))
        if key:
            table.setdefault(key, set()).add((eid, etype))

    for sym, name, gid in GENES:
        add(sym, gid, "gene")
        add(name, gid, "gene")
    for dname, did, _ in DISEASES:
        add(dname, did, "disease")
    for rsid, caid, hgvs, _, _ in VARIANTS:
        canonical = caid if caid else f"HGVS:{hgvs}"
        add(rsid, canonical, "variant")
        if caid:
            add(caid, canonical, "variant")
    return {k: sorted(v) for k, v in table.items()}


def detect(text: str, table) -> list[tuple[str, str, str, int]]:
    """Greedy longest-match scan; suppress mentions preceded by
    'unrecognized'; link = longest surface then lexicographic-min entity."""
    if not text:
        return []
    raw = TOKEN_RE.findall(text)
    toks = [t.lower() for t in raw]
    max_len = max((len(k) for k in table), default=1)
    out = []
    i = 0
    while i < len(toks):
        step = 1
        for ln in range(min(max_len, len(toks) - i), 0, -1):
            hits = table.get(tuple(toks[i : i + ln]))
            if hits:
                if not (i > 0 and toks[i - 1] == "unrecognized"):
                    surface = " ".join(raw[i : i + ln])
                    # best candidate only (longest form already chosen; tie →
                    # lexicographic-min entity id)
                    eid, etype = hits[0]
                    out.append((surface, eid, etype, i))
                step = ln
                break
        i += step
    return out


def build_cliques() -> dict[str, str]:
    """Mirror datagen.id_equivalences_df + lexicographic-min canonical."""
    import collections

    adj = collections.defaultdict(set)
    pairs = []
    for _, _, gid in GENES[:10]:
        n = gid.split(":")[1]
        pairs.append((gid, f"HGNC:{n}"))
        pairs.append((f"HGNC:{n}", f"ENSEMBL:ENSG{n.zfill(11)}"))
    for _, did, _ in DISEASES[:6]:
        n = did.split(":")[1]
        pairs.append((did, f"MONDO:{n.zfill(7)}"))
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    canon: dict[str, str] = {}
    seen: set[str] = set()
    for start in adj:
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
            canon[x] = m
        seen |= comp
    return canon


PRED_MAP = {
    "mentions": "biolink:mentions",
    "observed_in": "biolink:observed_in",
    "biolink:genetically_associated_with": "biolink:genetically_associated_with",
    "associated_with": "biolink:gene_associated_with_condition",
}


def expected_triples(rows) -> set[tuple[str, str, str]]:
    """rows: (conv_id, turn_idx, role, text, tool, ts) tuples.
    Returns the canonicalized (subject, predicate, object) set."""
    table = build_dictionary()
    canon = build_cliques()
    disease_assoc = {(d[1], d[2]) for d in DISEASES if d[2]}
    variant_info = {}
    for rsid, caid, hgvs, gid, cons in VARIANTS:
        canonical = caid if caid else f"HGVS:{hgvs}"
        variant_info[canonical] = (gid, cons)

    def c(x: str) -> str:
        return canon.get(x, x)

    triples: set[tuple[str, str, str]] = set()
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        ms = detect(text or "", table)
        turn = f"TURN:{conv_id}#{turn_idx}"
        genes_here = {eid for _, eid, et, _ in ms if et == "gene"}
        for _surface, eid, etype, _pos in ms:
            triples.add((turn, "biolink:mentions", c(eid)))
            if etype == "disease":
                for did, gid in disease_assoc:
                    if did == eid and gid in genes_here:
                        triples.add(
                            (c(gid), "biolink:gene_associated_with_condition", c(did))
                        )
            if etype == "variant":
                triples.add((c(eid), "biolink:observed_in", f"COHORT:{conv_id}"))
                gid, cons = variant_info[eid]
                triples.add((c(eid), SO_TO_PRED.get(cons, DEFAULT_PRED), c(gid)))
    return triples
