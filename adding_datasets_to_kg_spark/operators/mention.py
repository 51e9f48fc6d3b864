"""Batched biomedical mention detection over transcript text.

The transcript-domain analog of the reference's per-source converters
(/root/reference/src/midas/convert_data.py:11-117): where MIDAS pattern-matches
structured source fields into nodes/edges, we detect lexicon mentions in free
text and hand them to the linker.

Implementation contract (BASELINE.json north_star / input_hint):
- vectorized pandas/Arrow UDF — no per-row Python from Spark's perspective;
  one Arrow batch of turns in, one Arrow batch of mention arrays out;
- the compiled lexicon trie is BROADCAST once per executor (sc.broadcast),
  not shipped per task;
- matching is pure + deterministic (no dict-order dependence) so P/R vs the
  pure-Python oracle is stable (SURVEY.md §7.4.4);
- the "unrecognized" negative mirrors convert_data.py:28: a mention whose
  immediately-preceding token is "unrecognized" is suppressed.

Column-pruning note: the scan feeding this UDF should select ONLY
(conv_id, turn_idx, text) — the UDF is opaque to Catalyst, so we keep its
input narrow and apply it after all pushable filters (SURVEY.md §4.2.3).
"""

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MENTION_STRUCT = StructType(
    [
        StructField("term", StringType()),
        StructField("entity_id", StringType()),
        StructField("entity_type", StringType()),
        StructField("token_pos", IntegerType()),
    ]
)

_TOKEN_RE = re.compile(r"[A-Za-z0-9_:.>\-]+")


class LexiconTrie:
    """Token-level dictionary for multi-word term matching.

    Keys are tuples of lowercased tokens; values are sorted lists of
    (entity_id, entity_type). Sorted at build time → deterministic output.
    Matching is greedy-longest-first at each token position, one match per
    starting position (longest wins; all entities for that term emitted).
    """

    def __init__(self, entries: list[tuple[str, str, str]]):
        self.table: dict[tuple[str, ...], list[tuple[str, str]]] = {}
        self.max_len = 1
        for term, entity_id, entity_type in entries:
            key = tuple(t.lower() for t in _TOKEN_RE.findall(term))
            if not key:
                continue
            self.max_len = max(self.max_len, len(key))
            self.table.setdefault(key, []).append((entity_id, entity_type))
        for key in self.table:
            self.table[key] = sorted(set(self.table[key]))

    def find(self, text: str) -> list[tuple[str, str, str, int]]:
        if not text:
            return []
        raw = _TOKEN_RE.findall(text)
        toks = [t.lower() for t in raw]
        out: list[tuple[str, str, str, int]] = []
        i, n = 0, len(toks)
        while i < n:
            matched = 0
            for ln in range(min(self.max_len, n - i), 0, -1):
                key = tuple(toks[i : i + ln])
                hits = self.table.get(key)
                if hits:
                    # convert_data.py:28 analog: suppress when preceded by
                    # the literal token "unrecognized"
                    if i > 0 and toks[i - 1] == "unrecognized":
                        matched = ln
                        break
                    surface = " ".join(raw[i : i + ln])
                    for entity_id, entity_type in hits:
                        out.append((surface, entity_id, entity_type, i))
                    matched = ln
                    break
            i += matched if matched else 1
        return out


def build_lexicon_entries(
    gene_lexicon: DataFrame | None = None,
    disease_lexicon: DataFrame | None = None,
    variant_lexicon: DataFrame | None = None,
) -> list[tuple[str, str, str]]:
    """Collect the (small, dictionary-sized) lexicon tables to the driver and
    flatten to (term, entity_id, entity_type) entries.

    Lexicons are dimension tables (≪ transcripts); collecting them once and
    broadcasting the compiled trie is the intended scale path — the 100 TB
    side stays distributed.
    """
    # Null-guard EVERY term and entity id: one NULL cell in a dimension
    # table must degrade to a skipped entry, not a TypeError when the entry
    # set is sorted for the broadcast (None < str is unordered in Python).
    entries: list[tuple[str, str, str]] = []
    if gene_lexicon is not None:
        for r in gene_lexicon.select("symbol", "name", "gene_id").collect():
            if r["gene_id"] is None:
                continue
            if r["symbol"]:
                entries.append((r["symbol"], r["gene_id"], "gene"))
            if r["name"]:
                entries.append((r["name"], r["gene_id"], "gene"))
    if disease_lexicon is not None:
        for r in disease_lexicon.select("name", "disease_id").collect():
            if r["name"] and r["disease_id"]:
                entries.append((r["name"], r["disease_id"], "disease"))
    if variant_lexicon is not None:
        for r in variant_lexicon.select("rsid", "caid", "hgvs").collect():
            canonical = r["caid"] if r["caid"] else f"HGVS:{r['hgvs']}" if r["hgvs"] and not r["hgvs"].startswith("HGVS:") else r["hgvs"]
            if canonical is None:
                continue
            if r["rsid"]:
                entries.append((r["rsid"], canonical, "variant"))
            if r["caid"]:
                entries.append((r["caid"], canonical, "variant"))
    return entries


def detect_mentions(
    turns: DataFrame,
    entries: list[tuple[str, str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Append a ``mentions array<struct>`` column via a vectorized pandas UDF.

    SCALAR_ITER form: the trie is compiled ONCE per task from the broadcast
    entry list, then reused across every Arrow batch in the partition —
    per-batch work is a pure pandas ``map``.

    ``entries`` may be a pre-created Broadcast (pyspark.Broadcast) — callers
    that invoke this repeatedly (streaming micro-batches, per-bucket
    checkpointed runs) pass one hoisted broadcast instead of leaking a new
    one per call; see Lexicons.broadcast_entries().
    """
    from pyspark import Broadcast

    if isinstance(entries, Broadcast):
        bc = entries
    else:
        spark = turns.sparkSession
        bc = spark.sparkContext.broadcast(sorted(set(entries)))

    @F.pandas_udf(ArrayType(MENTION_STRUCT))
    def scan(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        trie = LexiconTrie(bc.value)
        for texts in batches:
            yield texts.map(trie.find)

    # The UDF IS deterministic, but declaring it so lets Catalyst duplicate
    # the ArrowEvalPython node when explode()'s implicit size>0 filter is
    # pushed down — the scan then runs twice per row (observed in
    # explain("formatted")). asNondeterministic() forces single evaluation.
    scan_once = scan.asNondeterministic()

    return turns.withColumn("mentions", scan_once(F.col(text_col)))


def explode_mentions(with_mentions: DataFrame, keep_cols: list[str]) -> DataFrame:
    """One row per detected mention (drops turns with no mentions)."""
    m = with_mentions.select(*keep_cols, F.explode("mentions").alias("m"))
    return m.select(
        *keep_cols,
        F.col("m.term").alias("term"),
        F.col("m.entity_id").alias("entity_id"),
        F.col("m.entity_type").alias("entity_type"),
        F.col("m.token_pos").alias("token_pos"),
    )
