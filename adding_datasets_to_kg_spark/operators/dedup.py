"""Deduplication family for large-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text, ...)`` table, each designed
so the candidate-generation step is an equi-join (shuffle on a small key),
never an O(n²) cross join:

- exact            — hash-groupBy on md5(text); one shuffle.
- minhash LSH      — shingle → single-pass per-seed min-hash fold → band
                     signature → bucket equi-join; only same-band pairs meet.
- simhash          — 64-bit sign-sum fingerprint from token hashes, split
                     into 4×16-bit bands; candidates share ≥1 band (banded
                     Hamming join — Hamming ≤ 3 is guaranteed caught), then
                     exact Hamming recheck. 16-bit variant kept as the
                     fingerprint expression (dedup_simhash_fingerprint entry).
- n-gram Jaccard   — inverted index on shingles (explode → join on shingle)
                     with a document-frequency cutoff (hot boilerplate
                     shingles never enter the posting-list join);
                     pair score = |∩| / (|A|+|B|-|∩|) over surviving shingles.
- embedding cosine — banded random-hyperplane LSH (md5-derived plane signs,
                     reproducible in any engine) + exact cosine recheck.
                     Brute-force self-join kept as the small-scale
                     cross-check oracle (n_planes=0 path).

Determinism: every hash is md5-of-string (identical in DuckDB) so the
DuckDB oracles in __spark_entry__ reproduce results bit-for-bit; the
embedding hyperplane signs are md5-derived on the DRIVER (hashlib) and
embedded as literals in both the Spark plan and the generated oracle SQL.

Scale notes: every candidate self-join materializes its small key table
(``localCheckpoint``) first, so the signature subtree is computed exactly
once — not re-evaluated on both join sides (the round-1 10× recompute trap).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from ..functions.vectors import as_double, cosine, dot


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
    """Array of per-seed min hashes, computed in ONE pass over the shingle
    array: each shingle is hashed once per seed into an n_hashes-wide row,
    then an element-wise-min fold collapses them. Hash_i(s) = md5('seed{i}:'
    || s) — string min is deterministic and engine-portable.

    (Round-1 version built n_hashes separate ``array_min(transform(...))``
    expressions, duplicating the shingle subtree n_hashes times — ~8× wasted
    compute at bench scale.)
    """
    hashed = F.transform(
        doc_shingles,
        lambda s: F.array(*[F.md5(F.concat(F.lit(f"seed{i}:"), s)) for i in range(n_hashes)]),
    )
    # 'zz…' sorts after every md5 hex string, so it is the fold identity.
    init = F.array_repeat(F.lit("zz"), n_hashes)
    return F.aggregate(
        hashed, init, lambda acc, row: F.zip_with(acc, row, lambda a, b: F.least(a, b))
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

    Scale shape: explode to (band_idx, band_key) → MATERIALIZE the small
    band table (localCheckpoint: signature computed once, not once per join
    side) → self-equi-join on the band key → distinct pairs. The join key
    space grows with corpus size, so bucket sizes stay small; hot bands
    (boilerplate docs) are AQE-skew-split.
    """
    bands = minhash_bands(docs, text_col, id_col, n_hashes, band_size, shingle_n)
    bands = bands.localCheckpoint(eager=True)
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


def simhash16_fingerprints(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, simhash int) — simhash16 values via the two-projection shape
    (per-token md5 materialized once, then 16 per-bit folds over the stored
    hashes; see simhash64_fingerprints for why this beats inlining the md5
    subtree into every fold ~4×). Values are bit-identical to
    ``simhash16(col)``."""
    hashed = docs.select(
        F.col(id_col), F.transform(tokens(text_col), F.md5).alias("_h")
    )
    def merger(nib: int, bit: int):
        def merge(acc, m):
            return acc + F.when(
                F.shiftright(_nibble_val(F.substring(m, nib + 1, 1)), bit)
                .bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))

        return merge

    total = None
    for j in range(16):
        contrib = F.aggregate(F.col("_h"), F.lit(0), merger(j // 4, j % 4))
        term = F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0))
        total = term if total is None else total + term
    return hashed.select(id_col, total.cast("int").alias("simhash"))


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


SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 16


def simhash64_fingerprints(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, b0..b3) — 64-bit simhash as 4×16-bit band values.

    Bit j (0..63) = sign of Σ_tokens ±1, where the per-token contribution is
    bit (j mod 4) of md5-hex nibble (j div 4) — the simhash16 formula
    extended to nibbles 0..15.

    Two-projection shape, deliberately: the first select materializes the
    per-token md5 array ONCE; the second runs the 64 per-bit folds over the
    stored hash strings. Folding everything into one projection re-inlines
    the md5 subtree into all 64 folds (64 md5s per token — measured 4×
    slower at sf0.1); a 64-wide array-accumulator fold is worse still
    (per-token array allocation, measured 6× slower).

    Scale: 2^64 fingerprint space never saturates (vs 65,536 buckets for the
    16-bit variant, which at 100 TB puts millions of docs per bucket and the
    pair join goes quadratic — the round-1 weakness this replaces).
    """
    hashed = docs.select(
        F.col(id_col), F.transform(tokens(text_col), F.md5).alias("_h")
    )

    def counter(j: int) -> Column:
        nib, bit = j // 4, j % 4
        return F.aggregate(
            F.col("_h"),
            F.lit(0),
            lambda acc, m: acc + F.when(
                F.shiftright(_nibble_val(F.substring(m, nib + 1, 1)), bit)
                .bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )

    band_cols = []
    for b in range(SIMHASH_BANDS):
        band = None
        for k in range(SIMHASH_BAND_BITS):
            term = F.when(counter(b * SIMHASH_BAND_BITS + k) > 0, F.lit(1 << k)).otherwise(F.lit(0))
            band = term if band is None else band + term
        band_cols.append(band.alias(f"b{b}"))
    return hashed.select(id_col, *band_cols)


def simhash64_band_sql(toks_expr: str, band: int) -> str:
    """DuckDB SQL for band ``band`` of the 64-bit simhash — the identical
    formula over a pre-computed token-array column/expression."""
    terms = []
    for k in range(SIMHASH_BAND_BITS):
        j = band * SIMHASH_BAND_BITS + k
        nib, bit = j // 4, j % 4
        contrib = (
            f"list_sum(list_transform({toks_expr}, t -> CASE WHEN "
            f"((strpos('0123456789abcdef', substr(md5(t), {nib + 1}, 1)) - 1) >> {bit}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {contrib} > 0 THEN {1 << k} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def dedup_simhash64(docs: DataFrame, max_hamming: int = 6,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by 64-bit simhash banded Hamming join.

    Candidates share ≥1 of 4 16-bit bands (guaranteed complete for Hamming
    ≤ 3 by pigeonhole; high-recall beyond), then an exact Hamming recheck
    over the full fingerprint keeps pairs with distance ≤ max_hamming.
    Output: (id_a, id_b, hamming).

    Scale shape: fingerprint table materialized once (localCheckpoint),
    band equi-join on (band_idx, band_val) — the per-bucket population is
    corpus_size / 2^16 per band on random text, and near-dup clusters are
    small; no cross join anywhere.
    """
    fp = simhash64_fingerprints(docs, text_col, id_col).localCheckpoint(eager=True)
    exploded = fp.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_idx"), F.col(f"b{i}").alias("band_val"))
                for i in range(SIMHASH_BANDS)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    fa = fp.select(F.col(id_col).alias("id_a"), *[F.col(f"b{i}").alias(f"a{i}") for i in range(SIMHASH_BANDS)])
    fb = fp.select(F.col(id_col).alias("id_b"), *[F.col(f"b{i}").alias(f"c{i}") for i in range(SIMHASH_BANDS)])
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"c{i}")))
        for i in range(SIMHASH_BANDS)
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_survivors(docs: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs → near-dup clusters → one survivor per cluster.

    The step every candidate-generation strategy above feeds: connected
    components over the pair graph (operators.canonicalize — driver
    union-find at dictionary scale, large-star/small-star beyond), survivor
    = min id per component, non-candidate docs survive unchanged. Output:
    (id, cluster_size) for survivors only.

    Scale shape: the pair graph is tiny relative to the corpus (near-dup
    clusters are small), so CC runs on pairs only; the corpus-wide part is
    one broadcast-able anti/left join against the loser set.
    """
    from .canonicalize import connected_components

    # CC canonicalizes by LEXICOGRAPHIC min; zero-pad numeric ids so the
    # lexicographic winner is the numeric-min doc (oracle picks min(id)).
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    cc = connected_components(
        pairs.select(pad("id_a").alias("id_a"), pad("id_b").alias("id_b"))
    )
    sizes = cc.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    losers = cc.filter(F.col("id") != F.col("canonical_id")).select("id")
    d = docs.select(pad(id_col).alias("id"))
    # NO broadcast hints: on a heavily-duplicated corpus the loser set is
    # corpus-scale (web crawls run ~50% dups) — AQE picks broadcast when the
    # pair graph is actually small, shuffle join when it is not.
    survivors = d.join(losers, "id", "left_anti")
    return (
        survivors.join(sizes, survivors.id == sizes.canonical_id, "left")
        .select(
            F.col("id").cast("long").alias(id_col),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        )
    )


# --- n-gram Jaccard ----------------------------------------------------------

def dedup_ngram_jaccard(docs: DataFrame, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3, max_df: int | None = None) -> DataFrame:
    """Pairs with shingle-set Jaccard ≥ threshold, via inverted index:
    explode distinct shingles → DF-filter → self-join on shingle → count
    intersections → Jaccard from (filtered) set sizes. Shuffle key = shingle
    (high cardinality → fine partitions); no cross join anywhere.

    Hot-shingle defense (the 100 TB scale-killer): shingles appearing in
    more than ``max_df`` documents are dropped BEFORE the posting-list
    self-join — a boilerplate trigram shared by 1M docs would otherwise
    produce a 10¹²-row bucket. The hot set is anti-joined (it is tiny by
    construction: ≤ total_postings / max_df entries, broadcastable), and
    sizes/Jaccard are computed over the surviving shingle space — i.e. hot
    shingles are treated like stopwords, deterministically on both the Spark
    and oracle sides.
    """
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("s")
    )
    if max_df is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    # Materialize the (filtered) posting list once for its three consumers
    # (sizes + both self-join sides) — MEMORY_AND_DISK persist, not
    # localCheckpoint: the posting list is corpus-scale, so spill-when-needed
    # beats an unconditional full disk copy; the eager count() prevents AQE's
    # concurrent query stages from racing the first materialization.
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    result = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the SMALL pair result, then release the corpus-scale
    # posting list — persisting it for the session lifetime would pin one
    # copy per corpus processed
    result = result.localCheckpoint(eager=True)
    sh.unpersist()
    return result


# --- embedding cosine ---------------------------------------------------------

def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix derived from md5 on the DRIVER:
    sign(i, j) = +1 iff the first hex nibble of md5('plane{i}:{j}') is even.
    Computed once with hashlib and embedded as LITERALS in both the Spark
    plan and the generated DuckDB oracle SQL — bit-identical bucketing in
    any engine with no runtime hashing (round-1 used runtime xxhash64, which
    no oracle could reproduce)."""
    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            nib = int(hashlib.md5(f"plane{i}:{j}".encode()).hexdigest()[0], 16)
            row.append(1.0 if nib % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def embedding_lsh_pairs(embs: DataFrame, threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        n_bands: int = 4, band_planes: int = 4,
                        dim: int = 64) -> DataFrame:
    """Banded random-hyperplane LSH + exact cosine recheck — the 100 TB path.

    Candidates share ALL ``band_planes`` sign bits in ≥1 of ``n_bands``
    bands (equi-join on (band_idx, band_key) — never a cross join), then an
    exact cosine recheck keeps pairs ≥ threshold. Recall for a pair at angle
    θ is 1-(1-(1-θ/π)^band_planes)^n_bands — ~0.99 at cos 0.95 with 4×4.
    Output: (id_a, id_b, cos).
    """
    planes = hyperplane_signs(n_bands * band_planes, dim)
    # d is a bare scan+cast — deliberately NOT materialized: the recheck
    # joins (va/vb) re-read the columnar source, which at 100 TB beats
    # writing a full copy of the corpus vectors to executor disk. Only the
    # SMALL band table below is checkpointed (it carries the plane-dot
    # compute and feeds both self-join sides).
    d = embs.select(F.col(id_col), as_double(vec_col).alias("v"))

    def bit(p: int) -> Column:
        plane = F.array(*[F.lit(x) for x in planes[p]])
        return F.when(dot(F.col("v"), plane) > 0, F.lit("1")).otherwise(F.lit("0"))

    band_keys = [
        F.concat(*[bit(b * band_planes + k) for k in range(band_planes)])
        for b in range(n_bands)
    ]
    bands = d.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), band_keys[b].alias("band_key"))
                for b in range(n_bands)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_key")
    bands = bands.localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    va = d.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = d.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 3))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_lsh_sql(threshold: float, n_bands: int = 4, band_planes: int = 4,
                      dim: int = 64, table: str = "embeddings",
                      vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    """DuckDB oracle reproducing embedding_lsh_pairs bit-for-bit: the SAME
    driver-side md5-derived plane literals, band construction, candidate
    join and cosine recheck."""
    planes = hyperplane_signs(n_bands * band_planes, dim)

    def lit(p: int) -> str:
        return "[" + ", ".join(str(x) for x in planes[p]) + "]"

    def bit(p: int) -> str:
        return f"(CASE WHEN list_dot_product(v, {lit(p)}) > 0 THEN '1' ELSE '0' END)"

    band_cols = ",\n             ".join(
        " || ".join(bit(b * band_planes + k) for k in range(band_planes)) + f" AS bk{b}"
        for b in range(n_bands)
    )
    band_union = "\n      UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band_idx, bk{b} AS band_key FROM bits"
        for b in range(n_bands)
    )
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
    bits AS (
      SELECT {id_col}, v,
             {band_cols}
      FROM v
    ),
    bands AS (
      {band_union}
    ),
    cand AS (
      SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.{id_col} < b.{id_col}
    )
    SELECT id_a, id_b, cos FROM (
      SELECT id_a, id_b,
             ROUND(list_dot_product(va.v, vb.v) /
                   (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 3) AS cos
      FROM cand JOIN v va ON va.{id_col} = id_a JOIN v vb ON vb.{id_col} = id_b
    ) WHERE cos >= {threshold}
    """


def dedup_embedding_cosine(embs: DataFrame, threshold: float = 0.95,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           n_planes: int = 16) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold. APPROXIMATE by default: the
    default n_planes=16 runs banded LSH, which recalls ~all pairs at
    dedup-grade thresholds (cos ≥ 0.95) but only a fraction of borderline
    ones — callers needing the exhaustive pair set must pass n_planes=0
    explicitly and accept the O(n²) cost.

    n_planes  > 0 → banded hyperplane LSH (embedding_lsh_pairs) — the
    registered/benched scale path; n_planes is split into 4 bands.
    n_planes == 0 → brute-force O(n²) self-join — kept ONLY as the
    small-scale cross-check (tests compare LSH ⊆ brute-force at sf0.001).
    """
    if n_planes > 0:
        n_bands = 4 if n_planes % 4 == 0 else 1
        return embedding_lsh_pairs(
            embs, threshold, vec_col, id_col,
            n_bands=n_bands, band_planes=n_planes // n_bands,
        )
    d = embs.select(F.col(id_col), as_double(vec_col).alias("v"))
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
