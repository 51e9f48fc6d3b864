"""Text column expressions: tokenization, canonical set-keys, shingles,
fingerprints, language-ID heuristics, quality scoring.

Reference parity:
- canonical token-set key  ← /root/reference/scripts/preprocessing/map_therapy_id_revised.py:41-59
  (order-insensitive ``tuple(sorted(set(tokens)))`` → equi-joinable string key)
- multi-separator split    ← map_therapy_id_revised.py:15-40
- normalization chain      ← map_therapy_id_revised.py:26,43-49

Everything is a native expression (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English stopwords for the language-ID / quality heuristics. Fixed, small,
# constant-folded into the plan (no broadcast needed).
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "but", "not", "have", "had", "they", "you", "we", "his", "her",
)

# Therapy-combination separators (map_therapy_id_revised.py:15-24).
COMBO_SEP_REGEX = r"(?i)\s*(?:/|,|;|\+|&|\band\b|\bwith\b)\s*"

# Therapy stopwords stripped anywhere in a token (map_therapy_id_revised.py:
# 20-21,46) — 'Tamoxifen therapy' must canonicalize equal to 'Tamoxifen'.
THERAPY_STOPWORDS_REGEX = r"\b(regimen|combination|combo|therapy|therapies)\b"


def tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization, empty strings dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), pattern), lambda t: t != "")


def canon_token(col: Column, strip_therapy_stopwords: bool = True) -> Column:
    """Lowercase, strip parentheticals, therapy stopwords and punctuation
    (keeping ``+``/``-`` per the reference's charset), squash whitespace
    (map_therapy_id_revised.py:26,43-49). Deviation kept from the reference:
    punctuation becomes a space (token split point) rather than vanishing.

    ``strip_therapy_stopwords=False`` gives the DOMAIN-NEUTRAL canonicalizer
    (used by the generic document fingerprint, where silently merging
    'winning combination' with 'winning' would be a dedup false positive);
    the default mirrors the reference's therapy-map canonicalization."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"\([^)]*\)", "")
    if strip_therapy_stopwords:
        c = F.regexp_replace(c, THERAPY_STOPWORDS_REGEX, " ")
    c = F.regexp_replace(c, r"[^a-z0-9+\s-]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def canonical_set_key(tok_array: Column, sep: str = "|") -> Column:
    """Order-insensitive canonical key: sort + dedup + join.

    Turns the reference's set-similarity therapy join
    (map_therapy_id_revised.py:51-59) into a plain equi-join key — the
    scale-critical trick: a set-similarity join becomes a hash/SMJ equi-join.
    """
    return F.array_join(F.array_sort(F.array_distinct(tok_array)), sep)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (for MinHash / Jaccard dedup).

    Expressed with ``transform`` over token indices — native, no UDF.
    """
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    return F.when(F.size(t) < n, F.array(F.array_join(t, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, n), " "))
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the canonicalized,
    order-insensitive token set. Stable across runs and engines. Uses the
    domain-neutral canonicalizer — therapy stopword stripping stays in the
    CIViC combo path only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(canonical_set_key(tokens(canon_token(c, strip_therapy_stopwords=False))))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are English stopwords."""
    t = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    return F.when(F.size(t) > 0, n_stop / F.size(t)).otherwise(F.lit(0.0))


def langid_en(col: Column | str, threshold: float = 0.08) -> Column:
    """Heuristic language ID: 'en' when stopword ratio clears threshold."""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] document-quality score from length, alpha ratio and
    stopword ratio — the training-data-pipeline filter heuristic."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    return F.round((alpha_ratio + len_score + stopword_ratio(c)) / 3.0, 4)
