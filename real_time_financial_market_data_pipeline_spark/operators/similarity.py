"""Similarity search over embedding columns (array<float>).

brute_force_knn: exact cosine top-k — broadcast the (small) query set
against the corpus, one pass, rank per query. The corpus side never
shuffles un-scored, and the rank is NOT a full-corpus window sort:
Spark's InferWindowGroupLimit plants a PARTIAL WindowGroupLimit below
the exchange, so every input partition locally sorts and keeps only
its own top-k rows per query before shuffling — the shuffle carries
O(k x queries x partitions) rows, with the final WindowGroupLimit +
window ranking only that bounded set (plan-pinned in
tests/test_plans.py::test_jvm_knn_has_partial_group_limit; the Arrow
strategy below achieves the same bound explicitly in numpy).

lsh_bucketed_knn: random-hyperplane LSH — deterministic seeded planes,
sign-bit bucket id, equi-join on bucket, rank within bucket. Approximate
(recall < 1) but the join is an equi-join on the bucket key: at 100 TB
this is the difference between a shuffle join and an infeasible cross
product.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.vectors import cosine_similarity, dot


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id so results are fully deterministic.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_knn_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul (mapInPandas).

    Same results as brute_force_knn; different physical strategy: the
    query matrix ships to executors in the closure, each Arrow batch
    computes a (batch × queries) BLAS matmul and emits only its LOCAL
    top-k per query, then one tiny global rank finishes. Per-batch
    partial top-k means the shuffle carries O(k × queries × partitions)
    rows — this is the high-dim/high-rate winner where per-element JVM
    expression evaluation (zip_with/aggregate) loses to vectorized BLAS.
    """
    import numpy as np
    from pyspark.sql import Window

    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, neighbor_id {id_type}, cosine double"

    q_rows = queries.select(query_id_col, vec_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], out_schema + ", rank int"
        )
    q_ids = [r[0] for r in q_rows]
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qm_norm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def batches(it):
        import pandas as pd

        for pdf in it:
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm_norm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm_norm @ qm_norm.T  # (batch, n_queries)
            top = min(len(pdf), k)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                idx = np.argpartition(-sims[:, j], top - 1)[:top]
                out_q.extend([qid] * top)
                out_n.extend(pdf[id_col].values[idx])
                out_c.extend(sims[idx, j])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    partial = corpus.select(id_col, vec_col).mapInPandas(batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python so the
    operator has no numpy dependency at plan-build time)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    bucket = F.lit(0)
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bucket = bucket * 2 + F.when(dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane) >= 0, 1).otherwise(0)
    return bucket


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    n_tables: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    n_planes=0 → exact all-pairs (the oracle-checkable ground truth;
    quadratic — small/blocked inputs only).

    n_planes>0 → multi-table sign-LSH (the 100 TB path): n_tables
    independent plane sets, candidates = union of same-bucket pairs
    across tables (OR-amplification), cosine verified on candidates
    only. Collision prob per table is (1-θ/π)^k, so recall =
    1-(1-p^k)^L — tune k (precision) against L (recall). Equi-join on
    (table, bucket); candidate count ∝ Σ bucket sizes², never all-pairs.
    """
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if n_planes == 0:
        a, b = c.alias("a"), c.alias("b")
        return (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                cosine_similarity(F.col("a._v"), F.col("b._v")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    if dim is None:
        raise ValueError("dim is required when n_planes > 0")
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(F.col("_v"), _hyperplanes(dim, n_planes, seed + t)).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    hashed = c.select("_id", F.explode(buckets).alias("_b")).select(
        "_id", "_b.table", "_b.bucket"
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = c.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = c.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is coarsely
    quantized into n_lists cells (centroids = deterministic sample of
    corpus vectors), each query probes its n_probe nearest cells, and
    exact cosine runs only within the probed cells.

    Scale shape: centroids are tiny and broadcast; corpus assignment is
    one narrow pass (argmax over n_lists dots); the search join is an
    equi-join on the cell id touching ~n_probe/n_lists of the corpus per
    query. At 100 TB the cell assignment is computed once and persisted
    with the table (partition-by-cell), making probes partition-pruned
    scans.
    """
    from pyspark.sql import Window

    # deterministic coarse centroids: the n_lists lowest-id vectors
    # (production: k-means refined offline; the operator contract is the
    # cell structure, not the centroid quality)
    cents = [
        (i, row[1])
        for i, row in enumerate(
            corpus.select(id_col, vec_col).orderBy(id_col).take(n_lists)
        )
    ]

    def nearest_cells(vec, n: int):
        scored = F.array(
            *[
                F.struct(
                    cosine_similarity(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias(
                        "sim"
                    ),
                    F.lit(cid).alias("cell"),
                )
                for cid, cvec in cents
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["cell"])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1).alias("_cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(nearest_cells(F.col(vec_col), n_probe)).alias("_cell"),
    )
    scored = c.join(F.broadcast(q), "_cell").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucketed_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = union over n_tables independent
    sign-LSH bucketings (OR-amplified recall, same as
    embedding_near_dup_pairs); exact cosine + rank within candidates."""

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket(
                        F.col(vec_alias), _hyperplanes(dim, n_planes, seed + t)
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(id_alias, vec_alias, F.explode(buckets).alias("_b")).select(
            id_alias, vec_alias, "_b.table", "_b.bucket"
        )

    c = bucketed(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")),
        "neighbor_id",
        "_cvec",
    )
    q = bucketed(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
        "query_id",
        "_qvec",
    )
    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    in_dim: int | None = None,
    seed: int = 42,
    out_col: str | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction as a pure column
    expression: project onto `out_dim` deterministic Gaussian unit
    directions (scaled by sqrt(in_dim/out_dim) so squared norms are
    preserved in expectation).  The standard pre-LSH step for high-dim
    embeddings — angles (hence cosine similarity) are approximately
    preserved, and every downstream operator (knn, LSH buckets,
    near-dup pairs) runs on out_dim-sized arrays.

    Map-side only: the projection matrix is a plan literal (out_dim x
    in_dim doubles — fine for the dims this is meant for), no shuffle,
    no UDF.
    """
    if in_dim is None:
        raise ValueError("in_dim is required (the projection matrix is a plan literal)")
    if out_dim < 1 or out_dim > in_dim:
        raise ValueError("out_dim must be in [1, in_dim]")
    scale = math.sqrt(in_dim / out_dim)
    planes = _hyperplanes(in_dim, out_dim, seed)
    projected = F.array(
        *[
            (dot(F.col(vec_col), F.array(*[F.lit(x) for x in p])) * scale).alias(f"_d{i}")
            for i, p in enumerate(planes)
        ]
    )
    return df.withColumn(out_col or vec_col, projected)
