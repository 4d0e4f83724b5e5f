"""Soundness-certificate tests (round-2 VERDICT task 3).

Two halves:
- the certificates hold on the real testdata (zero violations — the
  same invariant the driver hash-checks through
  approx_soundness_certificates' empty oracle);
- the certificates are SENSITIVE — a deliberately corrupted result
  produces violations, so the empty result is a real check, not a
  vacuous one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.certify import (
    decode_certificate,
    knn_certificate,
    minhash_certificate,
    pair_cosine_certificate,
    simhash_certificate,
)
from real_time_financial_market_data_pipeline_spark.operators.dedup import simhash_signatures
from real_time_financial_market_data_pipeline_spark.operators.multimodal import synthesize_media
from real_time_financial_market_data_pipeline_spark.serving import queries as Q
from tests.conftest import SF_DIR


def _docs(spark):
    return Q.load_table(spark, SF_DIR, "documents")


def _emb(spark):
    return Q.load_table(spark, SF_DIR, "embeddings")


def _queries_df(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_knn_certificate_fires_on_tampered_cosine(spark):
    emb = _emb(spark)
    good = Q.q_knn_lsh(spark, SF_DIR).localCheckpoint(eager=True)
    assert (
        knn_certificate(good, emb, _queries_df(emb), k=10, family="f").count() == 0
    )
    bad = good.withColumn(
        "cosine",
        F.when(F.col("rank") == 1, F.col("cosine") + 0.01).otherwise(F.col("cosine")),
    )
    kinds = {
        r["kind"]
        for r in knn_certificate(bad, emb, _queries_df(emb), k=10, family="f").collect()
    }
    assert "cosine_mismatch" in kinds


def test_knn_certificate_fires_on_broken_ranks(spark):
    emb = _emb(spark)
    good = Q.q_knn_ivf(spark, SF_DIR).localCheckpoint(eager=True)
    bad = good.withColumn(
        "rank", F.when(F.col("rank") == 2, F.lit(99)).otherwise(F.col("rank"))
    )
    kinds = {
        r["kind"]
        for r in knn_certificate(bad, emb, _queries_df(emb), k=10, family="f").collect()
    }
    assert "rank_bounds" in kinds and "rank_not_permutation" in kinds


def test_simhash_certificate_fires_on_dropped_pair(spark):
    docs = _docs(spark)
    sigs = simhash_signatures(docs).localCheckpoint(eager=True)
    good = Q.q_simhash_near_dups(spark, SF_DIR).localCheckpoint(eager=True)
    assert simhash_certificate(good, sigs, max_distance=8).count() == 0
    if good.count() == 0:
        return  # no pairs at this sf to drop
    first = good.limit(1)
    bad = good.join(first, ["id_a", "id_b"], "left_anti")
    kinds = {r["kind"] for r in simhash_certificate(bad, sigs, max_distance=8).collect()}
    assert kinds == {"missing_pair"}


def test_minhash_certificate_fires_on_injected_pair(spark):
    docs = _docs(spark)
    good = Q.q_minhash_near_dups(spark, SF_DIR).localCheckpoint(eager=True)
    assert minhash_certificate(good, docs, threshold=0.5).count() == 0
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()]
    fake = spark.createDataFrame(
        [(ids[0], ids[1], 0.99)], "id_a long, id_b long, jaccard double"
    )
    bad = good.unionByName(fake)
    kinds = {r["kind"] for r in minhash_certificate(bad, docs, threshold=0.5).collect()}
    # two unrelated docs: the reported 0.99 cannot match the true Jaccard
    assert "jaccard_mismatch" in kinds


def test_pair_cosine_certificate_fires_on_bad_ordering(spark):
    emb = _emb(spark)
    good = Q.q_embedding_near_dups_lsh(spark, SF_DIR).localCheckpoint(eager=True)
    assert pair_cosine_certificate(good, emb, 0.3, "f").count() == 0
    flipped = good.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine"
    )
    if flipped.count() == 0:
        return
    kinds = {r["kind"] for r in pair_cosine_certificate(flipped, emb, 0.3, "f").collect()}
    assert "bad_ordering" in kinds


def test_decode_certificate_fires_on_tampered_sum(spark):
    docs = _docs(spark)
    media = synthesize_media(docs, "doc_id", "text")
    good = Q.q_media_decode_features(spark, SF_DIR).localCheckpoint(eager=True)
    assert decode_certificate(good, media).count() == 0
    bad = good.withColumn("feature_sum", F.col("feature_sum") + 0.5)
    kinds = {r["kind"] for r in decode_certificate(bad, media).collect()}
    assert "feature_sum_mismatch" in kinds


def test_fuzzy_blocked_equals_exact(spark):
    """fuzzy_name_pairs_blocked traded its (redundant) oracle slot to
    approx_soundness_certificates; its invariant — exact equality with
    the all-pairs form — is pinned here instead."""
    exact = Q.q_fuzzy_name_pairs(spark, SF_DIR)
    blocked = Q.q_fuzzy_name_pairs_blocked(spark, SF_DIR)
    assert exact.count() == blocked.count()
    assert exact.exceptAll(blocked).count() == 0
    assert blocked.exceptAll(exact).count() == 0


def test_approx_distinct_certified_in_exact_twin(spark):
    rows = Q.q_distinct_users_by_type(spark, SF_DIR).collect()
    assert rows and all(r["approx_users_ok"] and r["approx_median_ok"] for r in rows)
    # the raw-estimate twin keeps its deterministic group count
    assert Q.q_approx_distinct_users(spark, SF_DIR).count() == len(rows)


def test_recall_certificate_green_at_operating_point_and_fires_on_regression(spark):
    """knn_recall_certificate (round-3/4 task 5): empty at the pinned
    configuration's operating point, NON-empty when a parameter
    regression (n_tables 8 -> 1) drops recall below the floor."""
    from real_time_financial_market_data_pipeline_spark.operators.certify import knn_recall_certificate
    from real_time_financial_market_data_pipeline_spark.operators.similarity import lsh_bucketed_knn

    emb = _emb(spark)
    qdf = _queries_df(emb)
    good = Q.q_knn_lsh(spark, SF_DIR).localCheckpoint(eager=True)
    assert (
        knn_recall_certificate(
            good, emb, qdf, k=10, family="knn_lsh", recall_floor=0.5
        ).count()
        == 0
    )
    degraded = lsh_bucketed_knn(
        emb, qdf, dim=64, k=10, n_planes=8, n_tables=1
    ).localCheckpoint(eager=True)
    viol = knn_recall_certificate(
        degraded, emb, qdf, k=10, family="knn_lsh", recall_floor=0.5
    ).collect()
    assert viol and all(r["kind"] == "recall_floor" for r in viol)
    assert all(r["observed"] < 0.5 for r in viol)


def test_planted_duplicate_certificate_green_and_fires_on_broken_banding(spark):
    """planted_duplicate_certificate: zero missed planted pairs for the
    real minhash operator; a pair function whose banding is broken
    (drops every cross-offset pair) misses all of them."""
    from real_time_financial_market_data_pipeline_spark.operators.certify import (
        planted_duplicate_certificate,
    )
    from real_time_financial_market_data_pipeline_spark.operators.dedup import minhash_near_dup_pairs

    docs = _docs(spark).select("doc_id", "text")
    ok = planted_duplicate_certificate(
        docs,
        lambda d: minhash_near_dup_pairs(d, threshold=0.5),
        family="minhash_near_dups",
        id_col="doc_id",
        qualify=F.length("text") >= 30,
    )
    assert ok.count() == 0

    def broken(d):
        # "banding" that never pairs an original with its clone
        return minhash_near_dup_pairs(d, threshold=0.5).filter(
            F.col("id_b") < 10_000_000_000
        )

    viol = planted_duplicate_certificate(
        docs, broken, family="minhash_near_dups", id_col="doc_id",
        qualify=F.length("text") >= 30,
    ).collect()
    assert viol and all(r["kind"] == "planted_dup_missed" for r in viol)


def test_decontamination_certificate_green_and_fires_on_missed_drop(spark, monkeypatch):
    """decontamination_certificate: planted benchmark copies in train
    are always dropped by the real decontaminate (zero violations); an
    operator that fails to drop (identity passthrough) fires one
    violation per plant."""
    from real_time_financial_market_data_pipeline_spark.operators import dedup
    from real_time_financial_market_data_pipeline_spark.operators.certify import (
        decontamination_certificate,
    )
    from real_time_financial_market_data_pipeline_spark.serving.queries import (
        _decontam_benchmark,
        _decontam_train,
    )

    docs = _docs(spark)
    train, bench = _decontam_train(docs), _decontam_benchmark(docs)
    qual = F.length("text") >= 30
    assert decontamination_certificate(train, bench, qualify=qual).count() == 0

    n_plants = bench.filter((F.col("doc_id") < 20) & qual).count()
    assert n_plants > 0
    monkeypatch.setattr(dedup, "decontaminate", lambda t, b, **kw: t)
    viol = decontamination_certificate(train, bench, qualify=qual).collect()
    assert len(viol) == n_plants
    assert all(r["kind"] == "planted_contamination_survived" for r in viol)


def test_repetition_certificate_green_and_fires_on_skewed_metric(spark, monkeypatch):
    """repetition_certificate: the array-expression operator and the
    independent relational re-derivation agree on real docs AND on edge
    docs (empty text, one token, duplicate-only); a perturbed operator
    (ratios nudged by 0.001) fires per-doc violations."""
    import pandas as pd

    from real_time_financial_market_data_pipeline_spark.functions import text as text_fns
    from real_time_financial_market_data_pipeline_spark.operators import certify

    assert certify.repetition_certificate(_docs(spark)).count() == 0

    edge = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "",
                    "word",
                    "same line\nsame line\nsame line",
                    "a b a b a b a b",
                ],
            }
        )
    )
    assert certify.repetition_certificate(edge).count() == 0

    real = text_fns.repetition_metrics

    def skewed(col):
        m = real(col)
        return F.struct(
            (m["dup_line_ratio"] + 0.001).alias("dup_line_ratio"),
            m["top_line_ratio"].alias("top_line_ratio"),
            m["dup_2gram_ratio"].alias("dup_2gram_ratio"),
        )

    monkeypatch.setattr(text_fns, "repetition_metrics", skewed)
    viol = certify.repetition_certificate(edge).collect()
    assert len(viol) == 4  # every doc's dup_line_ratio off by 0.001
    assert all(r["kind"] == "dup_line_ratio" for r in viol)


def test_span_certificate_green_and_fires_on_broken_operator(spark, monkeypatch):
    """span_certificate: zero violations on real docs; a span operator
    that mis-reports start_b fires span_extract_mismatch, and one that
    returns nothing fires planted_span_missed for every planted pair."""
    from real_time_financial_market_data_pipeline_spark.operators import certify, dedup

    assert certify.span_certificate(_docs(spark)).count() == 0

    real = dedup.repeated_span_pairs

    def shifted(df, **kw):
        out = real(df, **kw)
        return out.withColumn("start_b", F.col("start_b") + 1)

    monkeypatch.setattr(dedup, "repeated_span_pairs", shifted)
    viol = certify.span_certificate(_docs(spark)).collect()
    assert viol and all(
        r["kind"] in ("span_extract_mismatch", "planted_span_missed") for r in viol
    )
    assert any(r["kind"] == "span_extract_mismatch" for r in viol)

    monkeypatch.setattr(
        dedup,
        "repeated_span_pairs",
        lambda df, **kw: real(df, **kw).filter(F.lit(False)),
    )
    viol = certify.span_certificate(_docs(spark)).collect()
    assert len(viol) == 3  # C(3,2) planted pairs all missed
    assert all(r["kind"] == "planted_span_missed" for r in viol)


def test_span_decontamination_certificate_green_and_fires(spark, monkeypatch):
    """span_decontamination_certificate: zero violations with the real
    rule; a no-op decontaminator leaves every planted page and fires
    one planted_embedding_survived per plant."""
    from real_time_financial_market_data_pipeline_spark.operators import certify, dedup
    from real_time_financial_market_data_pipeline_spark.serving import queries as Q

    bench = Q._decontam_benchmark(_docs(spark))
    assert certify.span_decontamination_certificate(bench).count() == 0

    monkeypatch.setattr(dedup, "decontaminate_spans", lambda t, b, **kw: t)
    viol = certify.span_decontamination_certificate(bench).collect()
    assert viol and all(r["kind"] == "planted_embedding_survived" for r in viol)
    monkeypatch.undo()

    # a no-op SURGICAL operator leaves the benchmark text in place —
    # the residue leg must fire (round 8)
    monkeypatch.setattr(
        dedup,
        "excise_contaminated_spans",
        lambda t, b, **kw: t.withColumn("excised_tokens", F.lit(0)),
    )
    viol = certify.span_decontamination_certificate(bench).collect()
    assert viol and all(r["kind"] == "surgical_residue_detected" for r in viol)


def test_span_certificates_not_vacuous_when_nothing_plantable(spark):
    """A mis-sized subcorpus must read as a violation, not as green:
    both span certificates emit a dedicated planted_set_empty row when
    the planted frame would be empty (round-8 ADVICE)."""
    from real_time_financial_market_data_pipeline_spark.operators import certify

    empty = spark.createDataFrame([], "doc_id long, text string")
    viol = certify.span_certificate(empty).collect()
    assert len(viol) == 1 and viol[0]["kind"] == "planted_set_empty"

    one = spark.createDataFrame(
        [(1, "only one document here so no pair is plantable at all ok")],
        "doc_id long, text string",
    )
    viol = certify.span_certificate(one).collect()
    assert len(viol) == 1 and viol[0]["kind"] == "planted_set_empty"

    # every benchmark doc under plant_below shorter than k+2 tokens
    tiny = spark.createDataFrame(
        [(1, "too short"), (2, "also tiny")], "doc_id long, text string"
    )
    viol = certify.span_decontamination_certificate(tiny).collect()
    assert len(viol) == 1 and viol[0]["kind"] == "planted_set_empty"
