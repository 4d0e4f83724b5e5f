"""Soundness certificates for the approximate operators.

The approximate families (LSH kNN, IVF, simhash blocking, minhash
near-dups, blocked correlation, sketch decode) have no ANSI-SQL oracle
BY DESIGN — their outputs depend on seeded hash functions no other
engine reproduces.  What CAN be checked, exactly and cheaply, is
*soundness*: every row they emit must satisfy invariants that are
recomputable from first principles on the emitted rows only (linear in
|result|, never all-pairs — except the simhash certificate, whose
blocking is provably complete and is therefore certified against the
exact all-pairs form).

Each certificate function returns a VIOLATIONS DataFrame in the shared
`VIOLATION_SCHEMA`; an empty result is the certificate.  The serving
query `approx_soundness_certificates` unions every family and is
oracle-backed with `SELECT ... WHERE FALSE` — the driver's rows/schema/
hash comparison then certifies "zero violations" at every scale factor,
making the otherwise rows-only families driver-visible (round-2 VERDICT
task 3).

Recomputation is via an independent expression path wherever possible:
kNN cosines re-derive through normalize-then-dot (the operators use
dot-over-norm-product), simhash distances through bit_count(XOR) on the
re-joined signatures, and the fake-codec feature sums through a
JVM-side sha256 hex expansion that mirrors the Python decoder
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.vectors import dot, l2_normalize

VIOLATION_SCHEMA = (
    "family string, kind string, id_a string, id_b string, "
    "observed double, expected double"
)
_COLS = ["family", "kind", "id_a", "id_b", "observed", "expected"]


def _viol(df: DataFrame, family: str, kind: str, id_a, id_b, observed, expected) -> DataFrame:
    return df.select(
        F.lit(family).alias("family"),
        F.lit(kind).alias("kind"),
        id_a.cast("string").alias("id_a"),
        id_b.cast("string").alias("id_b"),
        observed.cast("double").alias("observed"),
        expected.cast("double").alias("expected"),
    )


def empty_violations(spark) -> DataFrame:
    return spark.createDataFrame([], VIOLATION_SCHEMA)


def knn_certificate(
    result: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    family: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    tol: float = 2e-6,
) -> DataFrame:
    """Soundness of a (query_id, neighbor_id, cosine, rank) top-k result:

    - cosine_mismatch: reported cosine != independent recomputation
      (normalize-then-dot) beyond rounding tolerance;
    - unknown_neighbor / unknown_query: id not present in the corpus /
      query set;
    - rank_bounds: rank outside [1, k];
    - rank_not_permutation: a query's ranks are not exactly 1..n;
    - rank_order: cosine increases with rank beyond tolerance (ranking
      inconsistent with the reported scores).

    Completeness (recall vs exact top-k) is intentionally NOT asserted
    here — it is the approximate operators' tunable; measured operating
    points are pinned in tests/test_properties.py.
    """
    r = result.select("query_id", "neighbor_id", "cosine", "rank")
    nv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    qv = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    joined = r.join(F.broadcast(qv), "query_id", "left").join(nv, "neighbor_id", "left")
    recomputed = dot(l2_normalize(F.col("_qv")), l2_normalize(F.col("_nv")))

    mismatch = _viol(
        joined.filter(
            F.col("_nv").isNotNull()
            & F.col("_qv").isNotNull()
            & (F.abs(recomputed - F.col("cosine")) > tol)
        ),
        family, "cosine_mismatch",
        F.col("query_id"), F.col("neighbor_id"), F.col("cosine"), recomputed,
    )
    unknown_n = _viol(
        joined.filter(F.col("_nv").isNull()),
        family, "unknown_neighbor",
        F.col("query_id"), F.col("neighbor_id"), F.col("cosine"), F.lit(None),
    )
    unknown_q = _viol(
        joined.filter(F.col("_qv").isNull()),
        family, "unknown_query",
        F.col("query_id"), F.col("neighbor_id"), F.col("cosine"), F.lit(None),
    )
    bad_rank = _viol(
        r.filter((F.col("rank") < 1) | (F.col("rank") > k)),
        family, "rank_bounds",
        F.col("query_id"), F.col("neighbor_id"), F.col("rank"), F.lit(k),
    )
    per_q = r.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(F.col("rank")).alias("_nd"),
        F.max("rank").alias("_mx"),
        F.min("rank").alias("_mn"),
    )
    not_perm = _viol(
        per_q.filter(
            (F.col("_nd") != F.col("_n")) | (F.col("_mx") != F.col("_n")) | (F.col("_mn") != 1)
        ),
        family, "rank_not_permutation",
        F.col("query_id"), F.lit(None), F.col("_nd"), F.col("_n"),
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    prev = F.lag("cosine").over(w)
    bad_order = _viol(
        r.withColumn("_prev", prev).filter(
            F.col("_prev").isNotNull() & (F.col("cosine") > F.col("_prev") + tol)
        ),
        family, "rank_order",
        F.col("query_id"), F.col("neighbor_id"), F.col("cosine"), F.col("_prev"),
    )
    out = mismatch
    for v in (unknown_n, unknown_q, bad_rank, not_perm, bad_order):
        out = out.unionByName(v)
    return out


def pair_cosine_certificate(
    result: DataFrame,
    vectors: DataFrame,
    threshold: float,
    family: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 2e-6,
) -> DataFrame:
    """Soundness of (id_a, id_b, cosine) near-dup pairs: recomputed
    cosine matches, cosine >= threshold, id_a < id_b, no duplicate
    pairs.  Every emitted pair being a TRUE near-dup means the result is
    a subset of the exact all-pairs form by construction — the subset
    certificate without materializing the quadratic exact set."""
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    joined = result.join(va, "id_a", "left").join(vb, "id_b", "left")
    recomputed = dot(l2_normalize(F.col("_va")), l2_normalize(F.col("_vb")))

    mismatch = _viol(
        joined.filter(
            F.col("_va").isNotNull()
            & F.col("_vb").isNotNull()
            & (F.abs(recomputed - F.col("cosine")) > tol)
        ),
        family, "cosine_mismatch",
        F.col("id_a"), F.col("id_b"), F.col("cosine"), recomputed,
    )
    unknown = _viol(
        joined.filter(F.col("_va").isNull() | F.col("_vb").isNull()),
        family, "unknown_id",
        F.col("id_a"), F.col("id_b"), F.col("cosine"), F.lit(None),
    )
    below = _viol(
        result.filter(F.col("cosine") < threshold - tol),
        family, "below_threshold",
        F.col("id_a"), F.col("id_b"), F.col("cosine"), F.lit(threshold),
    )
    order = _viol(
        result.filter(F.col("id_a") >= F.col("id_b")),
        family, "bad_ordering",
        F.col("id_a"), F.col("id_b"), F.lit(None), F.lit(None),
    )
    dup = _viol(
        result.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") > 1),
        family, "duplicate_pair",
        F.col("id_a"), F.col("id_b"), F.col("_n"), F.lit(1),
    )
    out = mismatch
    for v in (unknown, below, order, dup):
        out = out.unionByName(v)
    return out


def minhash_certificate(
    result: DataFrame,
    docs: DataFrame,
    threshold: float,
    family: str = "minhash_near_dups",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    tol: float = 6e-7,
) -> DataFrame:
    """Soundness of (id_a, id_b, jaccard) minhash near-dup pairs: the
    reported Jaccard must equal an independent recomputation from the
    raw text (shingle sets rebuilt outside the banded pipeline), be
    >= threshold, with id_a < id_b and no duplicates.  True-Jaccard
    soundness makes the result a subset of the exact ngram_jaccard_pairs
    output by construction."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import _shingled

    sh = _shingled(docs, id_col, text_col, shingle_n)
    sa = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sb = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    joined = result.join(sa, "id_a", "left").join(sb, "id_b", "left")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    recomputed = inter / union

    mismatch = _viol(
        joined.filter(
            F.col("_sha").isNotNull()
            & F.col("_shb").isNotNull()
            & (F.abs(recomputed - F.col("jaccard")) > tol)
        ),
        family, "jaccard_mismatch",
        F.col("id_a"), F.col("id_b"), F.col("jaccard"), recomputed,
    )
    unknown = _viol(
        joined.filter(F.col("_sha").isNull() | F.col("_shb").isNull()),
        family, "unknown_id",
        F.col("id_a"), F.col("id_b"), F.col("jaccard"), F.lit(None),
    )
    below = _viol(
        result.filter(F.col("jaccard") < threshold - tol),
        family, "below_threshold",
        F.col("id_a"), F.col("id_b"), F.col("jaccard"), F.lit(threshold),
    )
    order = _viol(
        result.filter(F.col("id_a") >= F.col("id_b")),
        family, "bad_ordering",
        F.col("id_a"), F.col("id_b"), F.lit(None), F.lit(None),
    )
    dup = _viol(
        result.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") > 1),
        family, "duplicate_pair",
        F.col("id_a"), F.col("id_b"), F.col("_n"), F.lit(1),
    )
    out = mismatch
    for v in (unknown, below, order, dup):
        out = out.unionByName(v)
    return out


def simhash_certificate(
    result: DataFrame,
    sig_df: DataFrame,
    max_distance: int,
    family: str = "simhash_near_dups",
    sample_mod: int = 1,
) -> DataFrame:
    """FULL equivalence of the pigeonhole-blocked hamming pairs against
    the exact all-pairs form: blocking is provably complete (at least
    min_agree whole segments agree within the radius), so unlike the
    probabilistic families this certificate asserts missing pairs too.

    CORRECTNESS HARNESS, NEVER PRODUCTION: the exact reference is
    quadratic in |sig_df| — it exists only to certify the blocked
    operator at oracle scale.  At larger sf set `sample_mod` > 1: a
    deterministic 1/sample_mod hash-sample of ids is checked (both pair
    endpoints sampled — equivalence over the sampled subcorpus, cost
    (|sig|/sample_mod)^2), and the result side is restricted to the
    same subcorpus so no false "extra_pair" rows appear."""
    if sample_mod > 1:
        keep = F.pmod(F.xxhash64(F.col("id")), F.lit(sample_mod)) == 0
        sig_df = sig_df.filter(keep)
        ids = sig_df.select("id")
        result = result.join(
            ids.select(F.col("id").alias("id_a")), "id_a", "leftsemi"
        ).join(ids.select(F.col("id").alias("id_b")), "id_b", "leftsemi")
    a = sig_df.select(F.col("id").alias("id_a"), F.col("simhash").alias("_s_a"))
    b = sig_df.select(F.col("id").alias("id_b"), F.col("simhash").alias("_s_b"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_dist", F.bit_count(F.col("_s_a").bitwiseXOR(F.col("_s_b"))))
        .filter(F.col("_dist") <= max_distance)
        .select("id_a", "id_b", "_dist")
    )
    missing = _viol(
        exact.join(result, ["id_a", "id_b"], "left_anti"),
        family, "missing_pair",
        F.col("id_a"), F.col("id_b"), F.lit(None), F.col("_dist"),
    )
    extra = _viol(
        result.join(exact, ["id_a", "id_b"], "left_anti"),
        family, "extra_pair",
        F.col("id_a"), F.col("id_b"), F.col("hamming"), F.lit(None),
    )
    dist_mismatch = _viol(
        result.join(exact, ["id_a", "id_b"]).filter(F.col("hamming") != F.col("_dist")),
        family, "distance_mismatch",
        F.col("id_a"), F.col("id_b"), F.col("hamming"), F.col("_dist"),
    )
    return missing.unionByName(extra).unionByName(dist_mismatch)


def correlation_certificate(
    result: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    min_corr: float,
    family: str = "price_path_correlation_blocked",
    tol: float = 1.01e-4,
) -> DataFrame:
    """Soundness of blocked correlated-series pairs: Pearson correlation
    over common hours recomputed per emitted pair (linear in |result|),
    must match the reported value to one ulp at the 4-decimal rounding,
    with the reported value >= min_corr and n_hours matching."""
    from real_time_financial_market_data_pipeline_spark.operators.timeseries import hourly_series

    hourly = hourly_series(source, key_cols, time_col, value_col)
    keyed = hourly.select(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias("id"),
        "hr",
        "p",
    )
    a = keyed.select(F.col("id").alias("id_a"), "hr", F.col("p").alias("_pa"))
    b = keyed.select(F.col("id").alias("id_b"), "hr", F.col("p").alias("_pb"))
    re = (
        result.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "hr"])
        .groupBy("id_a", "id_b")
        .agg(
            (F.round(F.corr("_pa", "_pb"), 4) + 0.0).alias("_re_corr"),
            F.count(F.lit(1)).alias("_re_n"),
        )
    )
    cmp = result.join(re, ["id_a", "id_b"], "left")
    missing = _viol(
        cmp.filter(F.col("_re_corr").isNull()),
        family, "unverifiable_pair",
        F.col("id_a"), F.col("id_b"), F.col("correlation"), F.lit(None),
    )
    mismatch = _viol(
        cmp.filter(
            F.col("_re_corr").isNotNull()
            & (F.abs(F.col("_re_corr") - F.col("correlation")) > tol)
        ),
        family, "correlation_mismatch",
        F.col("id_a"), F.col("id_b"), F.col("correlation"), F.col("_re_corr"),
    )
    below = _viol(
        result.filter(F.col("correlation") < min_corr),
        family, "below_threshold",
        F.col("id_a"), F.col("id_b"), F.col("correlation"), F.lit(min_corr),
    )
    n_mismatch = _viol(
        cmp.filter(F.col("_re_n").isNotNull() & (F.col("_re_n") != F.col("n_hours"))),
        family, "n_hours_mismatch",
        F.col("id_a"), F.col("id_b"), F.col("n_hours"), F.col("_re_n"),
    )
    return missing.unionByName(mismatch).unionByName(below).unionByName(n_mismatch)


def _sha_block_byte_sum(hex_col_name: str, n_bytes: int):
    """Sum of the first n_bytes bytes of a staged sha256 HEX column —
    pure JVM expression (conv per 2-hex-char pair).  The hex column must
    be a real projected column (HOF lambdas get no CSE)."""
    return F.expr(
        f"aggregate(transform(sequence(0, {n_bytes - 1}), "
        f"i -> cast(conv(substring({hex_col_name}, i*2+1, 2), 16, 10) as double)), "
        f"cast(0.0 as double), (a, x) -> a + x)"
    )


def decode_certificate(
    result: DataFrame,
    media: DataFrame,
    feature_dim: int = 64,
    family: str = "media_decode_features",
    tol: float = 1e-4,
) -> DataFrame:
    """Soundness of the deterministic fake decode (media_id, n_bytes,
    feature_sum): the Python sha256-expansion decoder is recomputed
    ENTIRELY JVM-side (sha2 over payload || counter, hex bytes summed,
    / 255) and must agree byte-for-byte; n_bytes must equal the payload
    length; the sum must lie in [0, feature_dim)."""
    if feature_dim % 32 != 0:
        raise ValueError("feature_dim must be a multiple of 32 (sha256 block size)")
    n_blocks = feature_dim // 32
    staged = media.select(F.col("media_id"), F.col("payload"))
    for c in range(n_blocks):
        staged = staged.withColumn(
            f"_h{c}",
            F.sha2(F.concat(F.col("payload"), F.lit(c.to_bytes(4, "big"))), 256),
        )
    byte_sum = _sha_block_byte_sum("_h0", 32)
    for c in range(1, n_blocks):
        byte_sum = byte_sum + _sha_block_byte_sum(f"_h{c}", 32)
    recomputed = staged.select(
        "media_id",
        F.length("payload").cast("long").alias("_len"),
        (byte_sum / F.lit(255.0)).alias("_re_sum"),
    )
    cmp = result.join(recomputed, "media_id", "left")
    unknown = _viol(
        cmp.filter(F.col("_len").isNull()),
        family, "unknown_media",
        F.col("media_id"), F.lit(None), F.col("feature_sum"), F.lit(None),
    )
    len_mismatch = _viol(
        cmp.filter(F.col("_len").isNotNull() & (F.col("n_bytes") != F.col("_len"))),
        family, "n_bytes_mismatch",
        F.col("media_id"), F.lit(None), F.col("n_bytes"), F.col("_len"),
    )
    sum_mismatch = _viol(
        cmp.filter(
            F.col("_re_sum").isNotNull()
            & (F.abs(F.col("feature_sum") - F.col("_re_sum")) > tol)
        ),
        family, "feature_sum_mismatch",
        F.col("media_id"), F.lit(None), F.col("feature_sum"), F.col("_re_sum"),
    )
    out_of_range = _viol(
        result.filter(
            (F.col("feature_sum") < 0) | (F.col("feature_sum") > feature_dim)
        ),
        family, "feature_sum_range",
        F.col("media_id"), F.lit(None), F.col("feature_sum"), F.lit(feature_dim),
    )
    return unknown.unionByName(len_mismatch).unionByName(sum_mismatch).unionByName(out_of_range)


def knn_recall_certificate(
    result: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    family: str,
    recall_floor: float,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """COMPLETENESS certificate for an approximate top-k result
    (round-3/4 VERDICT task: make recall driver-visible, not just a
    local pytest operating point).

    A deterministic 1/sample_mod hash-sample of the query set is
    answered EXACTLY (brute_force_knn — O(|sample| * corpus), bounded by
    the sample rate, never all-queries); per sampled query,
    recall@k = |approx ∩ exact| / k.  One violation row is emitted for
    every sampled query whose recall falls below `recall_floor` — so the
    union query `approx_soundness_certificates` goes non-empty the
    moment a parameter regression (fewer tables/probes, broken banding)
    drops recall below the documented operating point.

    `recall_floor` must be the documented operating point for the
    operator's configuration, verified at the driver's scale factors:
    fixed data + seeded hashes make recall deterministic, so the
    certificate is hash-stable (empty) while the configuration holds.
    At 100 TB, raise sample_mod (1-5% of queries) — the exact leg's cost
    scales with the sample, and the floor check is statistical anyway.
    """
    from real_time_financial_market_data_pipeline_spark.operators.similarity import brute_force_knn

    sampled = queries.filter(
        F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(sample_mod)) == 0
    )
    exact = brute_force_knn(
        corpus, sampled, k=k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col
    ).select("query_id", "neighbor_id")
    approx = result.join(
        sampled.select(F.col(query_id_col).alias("query_id")), "query_id", "leftsemi"
    ).select("query_id", "neighbor_id")
    overlap = exact.join(approx, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    per_q = (
        sampled.select(F.col(query_id_col).alias("query_id"))
        .join(overlap, "query_id", "left")
        .select("query_id", (F.coalesce(F.col("_hits"), F.lit(0)) / k).alias("_recall"))
    )
    return _viol(
        per_q.filter(F.col("_recall") < recall_floor),
        family, "recall_floor",
        F.col("query_id"), F.lit(None), F.col("_recall"), F.lit(recall_floor),
    )


def planted_duplicate_certificate(
    df: DataFrame,
    pair_fn,
    family: str,
    id_col: str,
    plant_below: int = 20,
    id_offset: int = 10_000_000_000,
    qualify=None,
) -> DataFrame:
    """RECOVERY certificate for a near-duplicate pair operator: plant
    exact duplicates and require every planted pair in the output.

    Rows with `id < plant_below` (optionally restricted by `qualify`,
    e.g. a minimum text length so shingling is well-defined) are cloned
    with `id + id_offset`; `pair_fn` runs over the augmented corpus.  An
    exact duplicate is recovered with probability 1 by every family here
    — identical text gives identical minhash signatures (same band keys
    in every band), identical vectors give identical sign-LSH buckets in
    every table — so a missed planted pair is a DETERMINISTIC
    correctness violation (broken banding/bucketing), not noise.  Cost:
    |plant| extra rows through the operator, O(1) relative to corpus.
    """
    planted = df.filter(F.col(id_col) < plant_below)
    if qualify is not None:
        planted = planted.filter(qualify)
    clones = planted.withColumn(id_col, F.col(id_col) + F.lit(id_offset))
    pairs = pair_fn(df.unionByName(clones))
    expected = planted.select(
        F.col(id_col).alias("id_a"), (F.col(id_col) + F.lit(id_offset)).alias("id_b")
    )
    missed = expected.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    )
    return _viol(
        missed,
        family, "planted_dup_missed",
        F.col("id_a"), F.col("id_b"), F.lit(0.0), F.lit(1.0),
    )


def decontamination_certificate(
    train: DataFrame,
    benchmark: DataFrame,
    family: str = "decontaminate",
    id_col: str = "doc_id",
    plant_below: int = 20,
    id_offset: int = 10_000_000_000,
    qualify=None,
    threshold: float = 0.5,
) -> DataFrame:
    """RECOVERY certificate for benchmark decontamination: plant exact
    copies of benchmark documents into the training corpus and require
    every one of them dropped.  An exact copy shares every minhash band
    key with its benchmark source (identical hash seeds across corpora
    by construction — dedup.minhash_cross_corpus_pairs), so a surviving
    plant is a deterministic banding/anti-join defect, not noise."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import decontaminate

    planted = benchmark.filter(F.col(id_col) < plant_below)
    if qualify is not None:
        planted = planted.filter(qualify)
    clones = planted.withColumn(id_col, F.col(id_col) + F.lit(id_offset))
    kept = decontaminate(
        train.unionByName(clones), benchmark, id_col=id_col, threshold=threshold
    )
    survived = kept.filter(F.col(id_col) >= id_offset)
    return _viol(
        survived,
        family, "planted_contamination_survived",
        F.col(id_col), (F.col(id_col) - id_offset), F.lit(1.0), F.lit(0.0),
    )


def repetition_certificate(docs: DataFrame, sample_mod: int = 1) -> DataFrame:
    """Certify functions.text.repetition_metrics: the operator computes
    its three ratios with JVM array expressions (split/array_distinct/
    aggregate over a staged token array); this certificate re-derives
    every ratio through a fully independent RELATIONAL path — explode
    lines and posexplode tokens, form bigrams by a positional self-join,
    then two-level groupBy counts — and emits a violation for any doc
    where the formulations disagree beyond 1e-9.  Both the line split
    and the word tokenization are spelled out INLINE here rather than
    imported from functions.text, so a code-level regression in the
    operator's helpers cannot silently propagate into the reference
    legs (the DEFINITION of a token is of course shared — only
    derivation independence is claimed).

    Linear in corpus size (explode + hash aggregates, no all-pairs);
    `sample_mod` thins the certified docs at larger scale factors."""
    from real_time_financial_market_data_pipeline_spark.functions.text import repetition_metrics

    base = docs.filter(F.col("doc_id") % sample_mod == 0).select("doc_id", "text")
    observed = base.select(
        "doc_id", repetition_metrics(F.col("text")).alias("m")
    ).select(
        "doc_id",
        F.col("m.dup_line_ratio").alias("o_dup_line"),
        F.col("m.top_line_ratio").alias("o_top_line"),
        F.col("m.dup_2gram_ratio").alias("o_dup_gram"),
    )

    # independent path 1: lines, relationally
    lines = base.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\n")).alias("line"),
    ).select("doc_id", F.trim("line").alias("line")).filter(F.col("line") != "")
    line_counts = lines.groupBy("doc_id", "line").count()
    line_stats = line_counts.groupBy("doc_id").agg(
        F.sum("count").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.max("count").alias("top_count"),
    )

    # independent path 2: bigrams via positional self-join over tokens
    # (tokenization re-derived inline — see docstring)
    inline_tokens = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda t: t != ""
    )
    toks = base.select("doc_id", F.posexplode(inline_tokens).alias("pos", "tok"))
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("tok2")
    )
    grams = toks.join(nxt, ["doc_id", "pos"]).select(
        "doc_id", F.concat_ws(" ", "tok", "tok2").alias("gram")
    )
    gram_counts = grams.groupBy("doc_id", "gram").count()
    gram_stats = gram_counts.groupBy("doc_id").agg(
        F.sum("count").alias("n_grams"),
        F.count("*").alias("n_gram_distinct"),
    )

    expected = (
        base.select("doc_id")
        .join(line_stats, "doc_id", "left")
        .join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(
                    1.0 - F.col("n_distinct") / F.col("n_lines").cast("double"),
                    F.lit(0.0),
                ),
                9,
            ).alias("e_dup_line"),
            F.round(
                F.coalesce(
                    F.col("top_count") / F.col("n_lines").cast("double"), F.lit(0.0)
                ),
                9,
            ).alias("e_top_line"),
            F.round(
                F.coalesce(
                    1.0 - F.col("n_gram_distinct") / F.col("n_grams").cast("double"),
                    F.lit(0.0),
                ),
                9,
            ).alias("e_dup_gram"),
        )
    )

    both = observed.join(expected, "doc_id")
    out = empty_violations(docs.sparkSession)
    for kind, o, e in [
        ("dup_line_ratio", "o_dup_line", "e_dup_line"),
        ("top_line_ratio", "o_top_line", "e_top_line"),
        ("dup_2gram_ratio", "o_dup_gram", "e_dup_gram"),
    ]:
        v = _viol(
            both.filter(F.abs(F.col(o) - F.col(e)) > 1e-9),
            "repetition_metrics",
            kind,
            F.col("doc_id"),
            F.lit(None),
            F.col(o),
            F.col(e),
        )
        out = out.unionByName(v)
    return out


def span_certificate(
    docs: DataFrame,
    k: int = 6,
    subcorpus_below: int = 200,
    plant_ids: int = 3,
    family: str = "repeated_spans",
) -> DataFrame:
    """Soundness + planted-recovery certificate for
    operators.dedup.repeated_span_pairs (round-6 VERDICT task 4).

    Soundness: every reported span must re-extract to IDENTICAL token
    sequences in both documents — `slice(tokens, start, span_tokens)`
    on each side, compared; linear in |result|.  This also surfaces an
    xxhash64 window-fingerprint collision, should one ever occur.
    Tokenization is re-derived inline (not imported) for the same
    derivation independence as repetition_certificate.

    Planted completeness: a distinctive `2k+q`-token block is appended
    to `plant_ids` documents of a bounded subcorpus; for EVERY pair of
    planted documents the operator must report a span whose extracted
    text contains the full block.  Recovery is deterministic (identical
    token windows hash identically, adjacency merges them), so a miss
    is a broken-fingerprint/merge defect, not noise.  Both legs run on
    a bounded subcorpus — O(1) relative to corpus size at every sf.
    """
    from real_time_financial_market_data_pipeline_spark.operators.dedup import repeated_span_pairs

    spark = docs.sparkSession
    inline_tokens = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda t: t != ""
    )

    base = docs.filter(F.col("doc_id") < subcorpus_below).select("doc_id", "text")

    # ---- planted corpus: block appended to the plant_ids smallest docs
    block_words = [f"xqzspanmark{i}" for i in range(2 * k + 3)]
    block = " ".join(block_words)
    plant = base.orderBy("doc_id").limit(plant_ids).select(
        "doc_id", F.concat_ws(" ", F.col("text"), F.lit(block)).alias("text")
    )
    # vacuity guard: with < 2 planted docs there are NO expected pairs and
    # the recovery leg would pass without exercising the operator at all —
    # a mis-sized subcorpus must read as a violation, not as green
    n_planted = plant.count()
    if n_planted < 2:
        return _viol(
            spark.range(1),
            family,
            "planted_set_empty",
            F.lit(None),
            F.lit(None),
            F.lit(float(n_planted)),
            F.lit(float(plant_ids)),
        )

    corpus = base.join(
        plant.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(plant).localCheckpoint(eager=True)

    spans = repeated_span_pairs(corpus, k=k).localCheckpoint(eager=True)
    toked = corpus.select("doc_id", inline_tokens.alias("_toks"))

    # ---- soundness: both sides of every span extract identically
    extracted = (
        spans.join(toked.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumn(
            "_ext_a",
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("start_a"), F.col("span_tokens"))),
        )
        .drop("_toks")
        .join(toked.withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumn(
            "_ext_b",
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("start_b"), F.col("span_tokens"))),
        )
        .drop("_toks")
    )
    mismatches = _viol(
        extracted.filter(F.col("_ext_a") != F.col("_ext_b")),
        family, "span_extract_mismatch",
        F.col("id_a"), F.col("id_b"),
        F.col("span_tokens").cast("double"), F.lit(None).cast("double"),
    )

    # ---- planted recovery: every planted pair has a span containing
    # the full block (extracted text checked, not just length)
    ids = plant.select(F.col("doc_id").alias("id_a"))
    expected_pairs = (
        ids.crossJoin(plant.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )  # bounded: plant_ids² rows
    covering = extracted.filter(F.col("_ext_a").contains(block)).select("id_a", "id_b")
    missed = _viol(
        expected_pairs.join(covering, ["id_a", "id_b"], "left_anti"),
        family, "planted_span_missed",
        F.col("id_a"), F.col("id_b"), F.lit(0.0), F.lit(float(len(block_words))),
    )
    return mismatches.unionByName(missed)


def span_decontamination_certificate(
    benchmark: DataFrame,
    k: int = 13,
    plant_below: int = 10,
    family: str = "decontaminate_spans",
) -> DataFrame:
    """RECOVERY certificate for the span-level decontamination rules:
    EMBED a verbatim k+spare-token window of each benchmark doc (from a
    bounded subcorpus) inside a synthetic filler training page; every
    planted page must be flagged by span_contaminated_ids and dropped
    by decontaminate_spans — and (round 8) the SURGICAL treatment
    `excise_contaminated_spans` must leave no page the detection rule
    still flags (residue leg) while keeping the page's own filler
    content (overcut leg: the cleaned text must retain the filler
    sentinel token).  Deterministic (identical windows hash
    identically), so a miss is a broken-fingerprint defect, not noise.
    Cost: |plant| synthetic pages through two fp equi-joins — O(1)
    relative to corpus size."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        decontaminate_spans,
        excise_contaminated_spans,
        span_contaminated_ids,
    )

    bench = (
        benchmark.filter(F.col("doc_id") < plant_below)
        .select("doc_id", "text")
        .withColumn("_toks", F.split(F.lower(F.col("text")), r"[^a-z0-9]+"))
        .withColumn("_toks", F.filter(F.col("_toks"), lambda t: t != ""))
        .filter(F.size("_toks") >= k + 2)  # enough for a robust window
    )
    filler = " ".join(f"xqzfill{i} pad{i * 3}" for i in range(30))
    planted = bench.select(
        (F.col("doc_id") + F.lit(20_000_000_000)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(filler),
            F.concat_ws(" ", F.slice(F.col("_toks"), 1, k + 2)),
            F.lit(filler),
        ).alias("text"),
    )
    # vacuity guard: if every benchmark doc under plant_below has fewer
    # than k+2 tokens, the planted frame is EMPTY and zero violations
    # would mean "never exercised", not "clean" — surface it as red
    if planted.isEmpty():
        return _viol(
            benchmark.sparkSession.range(1),
            family,
            "planted_set_empty",
            F.lit(None),
            F.lit(None),
            F.lit(0.0),
            F.lit(1.0),
        )
    bench_sub = benchmark.filter(F.col("doc_id") < plant_below)
    survivors = decontaminate_spans(planted, bench_sub, k=k)
    dropped = _viol(
        survivors,
        family, "planted_embedding_survived",
        F.col("doc_id"), F.lit(None), F.lit(1.0), F.lit(0.0),
    )

    # surgical legs: excised planted pages must (a) carry no window the
    # detection rule still flags, (b) still contain their own filler
    # content (the sentinel below appears in every synthetic page)
    cleaned = excise_contaminated_spans(planted, bench_sub, k=k)
    residue = _viol(
        span_contaminated_ids(cleaned, bench_sub, k=k),
        family, "surgical_residue_detected",
        F.col("doc_id"), F.lit(None),
        F.col("matched_windows").cast("double"), F.lit(0.0),
    )
    overcut = _viol(
        cleaned.filter(~F.col("text").contains("xqzfill0")),
        family, "surgical_overcut",
        F.col("doc_id"), F.lit(None), F.lit(0.0), F.lit(1.0),
    )
    return dropped.unionByName(residue).unionByName(overcut)
