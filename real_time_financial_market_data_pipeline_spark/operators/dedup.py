"""Deduplication operators — exact and approximate.

Capability parity: the reference's only dedup is
`dropDuplicates(["symbol","timestamp"])` (reference
src/consumer/transformations.py:137). Beyond parity, this module adds
the LLM-data-pipeline dedup family: MinHash+LSH, SimHash, n-gram
Jaccard — all built from JVM-side built-ins (no Python UDFs in the hot
path).

Scale notes:
- exact_dedup is a hash aggregate keyed on the dedup columns (map-side
  combine; one shuffle). Deterministic survivor selection via min_by.
- minhash LSH: signatures via k seeded xxhash64 mins (one explode + one
  hash-agg), candidate generation via a band-key self-join (equi-join →
  shuffle on band key, never all-pairs), verification by exact token
  Jaccard only on candidates. This is the standard shingle→minhash→
  band→bucket-join pipeline and scales linearly in corpus size for
  bounded bucket sizes.
- ngram_jaccard_pairs is the exact (quadratic) baseline — use only on
  small/blocked inputs; it exists as the oracle-checkable ground truth.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.text import tokens as _tokens


def exact_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    tiebreaker_col: str | None = None,
) -> DataFrame:
    """Keep exactly one row per key. With a tiebreaker column the survivor
    is deterministic (min tiebreaker) — unlike `dropDuplicates`, whose
    survivor depends on partitioning/order; determinism is what makes the
    operator oracle-checkable and retry-stable.
    """
    if tiebreaker_col is None:
        return df.dropDuplicates(list(key_cols))
    others = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*others), F.col(tiebreaker_col)).alias("_row")
    )
    return packed.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in others])


def shingles_of(tokens_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) from a pre-materialized tokens
    column. IMPORTANT: pass an attribute reference (a projected column),
    not a nested expression — expressions inside higher-order-function
    lambdas are re-evaluated per element (no CSE inside lambdas), which
    turns an O(len) shingle build into O(len²) regexp work.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens_col) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)))
    return F.array_distinct(F.filter(grams, lambda g: g != ""))


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, _sh) with tokens materialized in their own projection stage.

    The emptiness guard filters on the TOKEN array, not the shingle
    array: a predicate on _sh would be pushed below the projection and
    re-inline the whole shingle build into a per-row filter (seen: 3×
    recompute, quadratic tokenization). size(_tk)>0 ⇒ size(_sh)>0, and
    its pushed form costs one split per row.
    """
    return (
        df.select(F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select("_id", shingles_of(F.col("_tk"), n).alias("_sh"))
    )


_MERSENNE61 = (1 << 61) - 1


def base_hashes(shingle_col: Column) -> Column:
    """One xxhash64 per shingle, reduced mod 2^31 (so affine derivation
    below cannot overflow long arithmetic under ANSI mode)."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31)))


def minhash_signature(hash_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<long>) from a pre-materialized base-hash
    column (see base_hashes — materialize it first; see shingles_of for
    why). The k hash functions are derived affinely from the single base
    hash: h_i(x) = (a_i*x + b_i) mod M61, operands < 2^62 so ANSI-safe.
    This cuts string-hashing cost k× vs hashing each shingle k times.
    """
    import random

    rng = random.Random(0xD1CE)

    def derived(i: int) -> Column:
        a = rng.randrange(1, 1 << 30)
        b = rng.randrange(0, 1 << 30)
        return F.array_min(
            F.transform(hash_col, lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE61)))
        )

    return F.array(*[derived(i) for i in range(num_hashes)])


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    Pipeline: shingle → signature → band keys → explode bands →
    self-equi-join on (band_idx, band_hash) → distinct candidate pairs →
    exact Jaccard verify on the candidates only.
    """
    rows_per_band = num_hashes // bands
    # the shingle base feeds three plan branches (signatures + both verify
    # sides) — persist so the tokenize/shingle pass runs once. Lifecycle
    # note: the cache is left to Spark's LRU (unpersisting eagerly would
    # force recompute of the still-lazy result); callers running this in a
    # tight loop should clearCache() between rounds.
    base = _shingled(df, id_col, text_col, shingle_n).persist()
    sig = base.select("_id", base_hashes(F.col("_sh")).alias("_hx")).select(
        "_id", minhash_signature(F.col("_hx"), num_hashes).alias("_sig")
    )
    # band keys only — the (possibly large) shingle arrays must NOT ride
    # through the candidate self-join shuffle
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("_sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band", "_band.bhash").persist()  # both sides of the self-join

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify only the (few) candidates with exact Jaccard on the shingle sets
    sh_a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (the quadratic ground truth for the
    approximate dedup operators). Shuffles as a cross-range self-join on
    id ordering; use only on small or pre-blocked inputs.
    """
    base = _shingled(df, id_col, text_col, n).persist()
    a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, bit-vote, sign.

    Pure column expressions: for each bit, sum(+1/-1 over tokens) > 0.
    Near-dup candidates are rows with small Hamming distance — compare via
    bit_count(sig_a ^ sig_b) (see hamming_pairs).
    """
    # stage token hashes as a real column: the 64 bit-vote aggregates below
    # each reference it, and expressions inside HOF lambdas get no CSE
    hashed = df.select(
        F.col(id_col).alias("id"), F.array_distinct(_tokens(F.col(text_col))).alias("_tk")
    ).select("id", F.transform("_tk", lambda t: F.xxhash64(t)).alias("_hx"))

    def _vote(mask: int):
        # closure factory (NOT a default-arg lambda: pyspark binds extra
        # lambda params as HOF arguments)
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    sig = F.lit(0).cast("long")
    for b in range(bits):
        mask = (1 << b) if b < 63 else -(1 << 63)  # signed-64 top bit
        vote = F.aggregate(F.col("_hx"), F.lit(0), _vote(mask))
        bit = F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        # shift/or construction: bit ops never overflow-error under ANSI mode
        sig = sig.bitwiseOR(F.shiftleft(bit, b))
    return hashed.select("id", sig.alias("simhash"))


def hamming_pairs(sig_df: DataFrame, max_distance: int = 3) -> DataFrame:
    """All pairs from simhash_signatures within a Hamming radius.

    Pigeonhole blocking: the 64 bits are cut into max_distance+1
    segments, so any pair within the radius must agree on at least one
    whole segment — the candidate join is an equi-join on (segment index,
    segment value), never a cross join, and completeness holds for ANY
    radius (segment count scales with it).
    """
    n_seg = max_distance + 1
    if n_seg > 64:
        raise ValueError("max_distance must be < 64")
    width = 64 // n_seg
    segments = []
    for i in range(n_seg):
        start = i * width
        # last segment absorbs the remainder bits
        seg_width = 64 - start if i == n_seg - 1 else width
        mask = (1 << seg_width) - 1 if seg_width < 64 else -1
        segments.append(
            F.struct(
                F.lit(i).alias("seg"),
                F.shiftrightunsigned("simhash", start).bitwiseAND(F.lit(mask)).alias("segval"),
            )
        )
    seg = sig_df.select(
        "id", "simhash", F.explode(F.array(*segments)).alias("s")
    ).select("id", "simhash", "s.seg", "s.segval")
    l, r = seg.alias("l"), seg.alias("r")
    return (
        l.join(
            r,
            (F.col("l.seg") == F.col("r.seg"))
            & (F.col("l.segval") == F.col("r.segval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_distance)
    )
