"""Deduplication family for large-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text, ...)`` table, each designed
so the candidate-generation step is an equi-join (shuffle on a small key),
never an O(n²) cross join:

- exact            — hash-groupBy on md5(text); one shuffle.
- minhash LSH      — shingle → per-seed min-hash → band signature →
                     bucket equi-join; only same-band pairs are compared.
- simhash          — 16-bit sign-sum fingerprint from token hashes; candidate
                     pairs share the fingerprint (or a rotated band of it).
- n-gram Jaccard   — inverted index on shingles (explode → join on shingle),
                     pair score = |∩| / (|A|+|B|-|∩|); prefix-filtered.
- embedding cosine — LSH via random-hyperplane sign bits OR brute-force for
                     oracle-checkable exactness at small scale.

Determinism: every hash is md5-of-string (identical in DuckDB) so the
DuckDB oracles in __spark_entry__ reproduce results bit-for-bit; xxhash64 is
deliberately avoided in anything oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from ..functions.vectors import as_double, cosine


# --- exact -----------------------------------------------------------------

def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep min-id representative per exact text hash. Output: survivors."""
    h = F.md5(F.col(text_col))
    return (
        docs.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_h")
    )


# --- minhash LSH -----------------------------------------------------------

def minhash_signature(doc_shingles: Column, n_hashes: int) -> Column:
    """Array of per-seed min hashes. Hash_i(s) = md5(i || s) — string min is
    deterministic and engine-portable."""
    def hasher(i: int):
        def h(s):
            return F.md5(F.concat(F.lit(f"seed{i}:"), s))

        return h

    return F.array(
        *[F.array_min(F.transform(doc_shingles, hasher(i))) for i in range(n_hashes)]
    )


def minhash_bands(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n_hashes: int = 8, band_size: int = 2, shingle_n: int = 3) -> DataFrame:
    """(id, band_idx, band_key) — LSH banding; same band_key → candidate."""
    sig = minhash_signature(shingles(text_col, shingle_n), n_hashes)
    n_bands = n_hashes // band_size
    d = docs.select(F.col(id_col), sig.alias("_sig"))
    bands = d.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws("|", *[F.element_at("_sig", b * band_size + j + 1)
                                           for j in range(band_size)]).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    return bands.select(id_col, "band.band_idx", "band.band_key")


def dedup_minhash_lsh(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 8, band_size: int = 2, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    Scale shape: explode to (band_idx, band_key) → self-equi-join on the
    band key → distinct pairs. The join key space grows with corpus size, so
    bucket sizes stay small; hot bands (boilerplate docs) are AQE-skew-split.
    """
    bands = minhash_bands(docs, text_col, id_col, n_hashes, band_size, shingle_n)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# --- simhash ----------------------------------------------------------------

def _nibble_val(hex_char: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), hex_char) - 1


def simhash16(text_col: Column) -> Column:
    """16-bit simhash from whitespace tokens.

    Bit j (0..15) comes from bit (j mod 4) of md5-hex nibble (j div 4): sum
    +1/-1 over tokens, sign → bit. Pure expressions; the identical formula is
    generated as SQL for the DuckDB oracle (simhash16_sql)."""
    toks = tokens(text_col)

    def bit_merger(nib: int, bit: int):
        def merge(acc, t):
            return acc + F.when(
                F.shiftright(_nibble_val(F.substring(F.md5(t), nib + 1, 1)), bit)
                .bitwiseAND(F.lit(1))
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))

        return merge

    bits = []
    for j in range(16):
        contrib = F.aggregate(toks, F.lit(0), bit_merger(j // 4, j % 4))
        bits.append(F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def simhash16_sql(text_expr: str) -> str:
    """DuckDB SQL generating the identical 16-bit simhash (oracle side)."""
    tok = f"list_filter(string_split(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g')), ' '), t -> t <> '')"
    bit_terms = []
    for j in range(16):
        nib, bit = j // 4, j % 4
        contrib = (
            f"list_sum(list_transform({tok}, t -> CASE WHEN "
            f"((strpos('0123456789abcdef', substr(md5(t), {nib + 1}, 1)) - 1) >> {bit}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"(CASE WHEN {contrib} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bit_terms) + ")"


def dedup_simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidate pairs: identical simhash16 (id_a < id_b)."""
    d = docs.select(F.col(id_col), simhash16(F.col(text_col)).alias("sh"))
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# --- n-gram Jaccard ----------------------------------------------------------

def dedup_ngram_jaccard(docs: DataFrame, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3) -> DataFrame:
    """Pairs with shingle-set Jaccard ≥ threshold, via inverted index:
    explode distinct shingles → self-join on shingle → count intersections →
    Jaccard from set sizes. Shuffle key = shingle (high cardinality → fine
    partitions); no cross join anywhere."""
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- embedding cosine ---------------------------------------------------------

def dedup_embedding_cosine(embs: DataFrame, threshold: float = 0.95,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           n_planes: int = 0) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold.

    n_planes == 0 → brute-force self-join (oracle-exact; small scale only).
    n_planes  > 0 → random-hyperplane LSH prefilter: docs sharing the sign
    pattern on deterministic pseudo-hyperplanes join first — the 100 TB path
    (bucket join instead of cross join), then exact cosine re-check.
    """
    d = embs.select(F.col(id_col), as_double(vec_col).alias("v"))
    if n_planes > 0:
        # deterministic pseudo-random hyperplanes from hash of (plane, dim):
        # sign bit = whether sum_j v[j]*h(i,j) > 0, h in {-1,+1}
        def plane_bit(i: int) -> Column:
            def signed_term(x, j):
                return x * F.when(
                    F.pmod(F.xxhash64(F.lit(i), j), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))

            signed = F.aggregate(
                F.zip_with(F.col("v"), F.sequence(F.lit(0), F.size("v") - 1), signed_term),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return F.when(signed > 0, F.lit("1")).otherwise(F.lit("0"))

        d = d.withColumn("bucket", F.concat(*[plane_bit(i) for i in range(n_planes)]))
        a, b = d.alias("a"), d.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
    else:
        a, b = d.alias("a"), d.alias("b")
        pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 3).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
