"""Property-based tests (hypothesis): operator invariants that must hold
for ANY input, not just fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.asof import asof_join
from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv

BASE = datetime(2024, 1, 1)

trades_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.floats(min_value=0.01, max_value=1e5, allow_nan=False, width=64),
        st.integers(min_value=1, max_value=10_000),
        st.integers(min_value=0, max_value=3600),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=trades_strategy)
@_settings
def test_ohlcv_invariants(spark, rows):
    df = spark.createDataFrame(
        [(s, p, v, BASE + timedelta(seconds=off)) for s, p, v, off in rows],
        "symbol string, price double, volume long, event_time timestamp",
    )
    bars = ohlcv(df, "5 minutes").collect()
    # conservation: every input row lands in exactly one bar
    assert sum(b["trade_count"] for b in bars) == len(rows)
    assert sum(b["volume"] for b in bars) == sum(v for _, _, v, _ in rows)
    for b in bars:
        assert b["low"] <= b["open"] <= b["high"]
        assert b["low"] <= b["close"] <= b["high"]
        assert b["low"] <= b["vwap"] <= b["high"] or abs(b["vwap"] - b["low"]) < 1e-9
        assert b["window_end"] == b["window_start"] + timedelta(minutes=5)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 5), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_exact_dedup_idempotent_and_complete(spark, rows):
    from real_time_financial_market_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(s, t, v) for s, t, v in rows], "symbol string, timestamp long, event_id long"
    )
    once = exact_dedup(df, ["symbol", "timestamp"], tiebreaker_col="event_id")
    twice = exact_dedup(once, ["symbol", "timestamp"], tiebreaker_col="event_id")
    got = sorted(map(tuple, once.collect()))
    assert got == sorted(map(tuple, twice.collect()))  # idempotent
    keys = {(s, t) for s, t, _ in rows}
    assert {(r[0], r[1]) for r in got} == keys  # every key survives once
    # survivor is always the minimum tiebreaker for its key
    expect = {}
    for s, t, v in rows:
        expect[(s, t)] = min(v, expect.get((s, t), v))
    assert {(r[0], r[1]): r[2] for r in got} == expect


@given(
    left_offs=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=15),
    right_offs=st.lists(st.integers(min_value=0, max_value=600), min_size=0, max_size=15),
)
@_settings
def test_asof_join_invariants(spark, left_offs, right_offs):
    left = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=o), float(i)) for i, o in enumerate(left_offs)],
        "k int, event_time timestamp, lv double",
    )
    right = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=o), float(o)) for o in right_offs],
        "k int, event_time timestamp, rv double",
    ) if right_offs else spark.createDataFrame([], "k int, event_time timestamp, rv double")

    out = asof_join(left, right, on=["k"]).collect()
    assert len(out) == len(left_offs)  # left-join semantics: no row loss
    for r in out:
        if r["asof_time"] is not None:
            assert r["asof_time"] <= r["event_time"]  # never a future match
            # the match is the LATEST right row at-or-before: rv == seconds
            # offset of that row, so no right row may exist strictly between
            matched_off = int(r["rv"])
            row_off = int((r["event_time"] - BASE).total_seconds())
            between = [o for o in right_offs if matched_off < o <= row_off]
            assert not between
        else:
            row_off = int((r["event_time"] - BASE).total_seconds())
            assert not [o for o in right_offs if o <= row_off]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sigs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=24,
        unique=True,
    )
)
def test_hamming_pairs_multi_segment_equivalence(spark, sigs):
    """Generalized pigeonhole blocking is exact: min_agree=2 (wide
    segments, pair keys — the billion-doc bucket-occupancy fix) returns
    IDENTICAL pairs to the classic min_agree=1 blocking at radius 3."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import hamming_pairs

    # salt in some near-duplicates: flip 1-3 bits of the first signature
    base = sigs[0]
    salted = sigs + [base ^ 0b1, base ^ (1 << 20) ^ (1 << 45), base ^ 0b111]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(dict.fromkeys(salted))], "id long, simhash long"
    )
    classic = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, max_distance=3, min_agree=1).collect()
    }
    wide = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, max_distance=3, min_agree=2).collect()
    }
    assert classic == wide
    # the salted 1-3 bit flips must all be found (completeness)
    assert sum(1 for a, b, h in wide if a == 0 or b == 0) >= 3


def test_minhash_rejects_bad_band_config(spark):
    import pytest as _pytest

    from real_time_financial_market_data_pipeline_spark.operators.dedup import minhash_near_dup_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bands"):
        minhash_near_dup_pairs(df, num_hashes=16, bands=5)
    with _pytest.raises(ValueError, match="bands"):
        minhash_near_dup_pairs(df, num_hashes=16, bands=32)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=4),
    cap=st.integers(min_value=1, max_value=12),
)
def test_bounded_ordered_path_cap(spark, sizes, cap):
    """bounded_ordered_path == unbounded ordered path truncated to cap,
    with the FULL group count preserved — for any group sizes and cap."""
    from real_time_financial_market_data_pipeline_spark.operators.topk import bounded_ordered_path

    rows = [
        (g, i, float(g * 1000 + i))
        for g, size in enumerate(sizes)
        for i in range(size)
    ]
    df = spark.createDataFrame(rows, "grp int, seq int, val double")
    out = {
        r["grp"]: r
        for r in bounded_ordered_path(
            df, ["grp"], ["seq"], "val", cap=cap, path_col="path", count_col="n"
        ).collect()
    }
    for g, size in enumerate(sizes):
        expect_path = [float(g * 1000 + i) for i in range(min(size, cap))]
        assert out[g]["path"] == expect_path, (g, cap)
        assert out[g]["n"] == size
        assert len(out[g]["path"]) <= cap


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == textbook union-find on any
    random small graph (including chains longer than one hop)."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    l_offs=st.lists(st.integers(0, 3600), min_size=1, max_size=15),
    r_offs=st.lists(st.integers(0, 3600), min_size=1, max_size=15),
    gap=st.sampled_from([30, 120, 600]),
)
def test_interval_join_matches_naive(spark, l_offs, r_offs, gap):
    """Bucketized interval join returns EXACTLY the naive theta join's
    pairs for any inputs/gap (no dup from the 2-bucket explode, no miss
    at bucket boundaries)."""
    from datetime import datetime, timedelta

    from real_time_financial_market_data_pipeline_spark.operators.rangejoin import interval_join

    t0 = datetime(2024, 1, 15, 12, 0, 0)
    left = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=o)) for i, o in enumerate(l_offs)],
        "lid int, event_time timestamp",
    )
    right = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=o)) for i, o in enumerate(r_offs)],
        "rid int, event_time timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, max_gap_seconds=gap).collect()
    }
    want = {
        (i, j)
        for i, lo in enumerate(l_offs)
        for j, ro in enumerate(r_offs)
        if lo - gap < ro <= lo
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=0, max_value=200),
    chunk=st.integers(min_value=2, max_value=32),
    stride_frac=st.floats(min_value=0.3, max_value=1.0),
)
def test_chunking_invariants(spark, n_tokens, chunk, stride_frac):
    """Every token lands in at least one chunk, chunks match the exact
    expected windows, and non-final chunks are full-size — for any
    document length, window, and stride <= window."""
    from real_time_financial_market_data_pipeline_spark.operators.chunking import chunk_documents

    stride = max(1, int(chunk * stride_frac))
    words = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    expected = [
        words[s : s + chunk] for s in range(0, n_tokens, stride)
    ]
    assert len(rows) == len(expected)
    for r, exp in zip(rows, expected):
        assert r["chunk_text"].split() == exp
        assert r["n_tokens"] == len(exp)
    # coverage: every token index appears in some chunk
    covered = set()
    for i, exp in enumerate(expected):
        covered.update(range(i * stride, i * stride + len(exp)))
    assert covered == set(range(n_tokens))


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_star_components_match_union_find(spark, edges):
    """Large-star/small-star components == union-find, including a
    16-node chain salted in (diameter 15 — the shape min-label needs 15
    rounds for and star contraction handles in O(log n))."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import connected_components_star

    chain = [(100 + i, 100 + i + 1) for i in range(15)]
    all_edges = edges + chain
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in all_edges], "id_a long, id_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components_star(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in all_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    tokens_a=st.lists(st.sampled_from("alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()), min_size=4, max_size=30),
    drop=st.integers(min_value=0, max_value=3),
)
def test_signature_jaccard_estimator_properties(spark, tokens_a, drop):
    """banded_signatures / signature_jaccard invariants: identical texts
    estimate exactly 1.0 (same signature, same band hashes in every
    band); an edited text estimates in [0, 1]; each indexable doc emits
    exactly `bands` rows."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        signature_jaccard,
    )

    text_a = " ".join(tokens_a)
    text_b = " ".join(tokens_a[: len(tokens_a) - drop] or ["zulu"])
    df = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, text_b)], "doc_id long, text string"
    )
    bands_df = banded_signatures(df, bands=4).cache()
    per_doc = {r["id"]: r["count"] for r in bands_df.groupBy("id").count().collect()}
    assert all(v == 4 for v in per_doc.values())

    sigs = {r["id"]: r["sig"] for r in bands_df.select("id", "sig").dropDuplicates(["id"]).collect()}
    est = spark.createDataFrame(
        [(sigs[1], sigs[2]), (sigs[1], sigs[3])], "a array<bigint>, b array<bigint>"
    ).select(signature_jaccard(F.col("a"), F.col("b")).alias("j")).collect()
    assert est[0]["j"] == 1.0  # identical text -> identical signature
    assert 0.0 <= est[1]["j"] <= 1.0

    # identical docs share EVERY band hash (the recovery guarantee the
    # planted-duplicate certificate relies on)
    b1 = {(r["band"], r["bhash"]) for r in bands_df.filter(F.col("id") == 1).collect()}
    b2 = {(r["band"], r["bhash"]) for r in bands_df.filter(F.col("id") == 2).collect()}
    assert b1 == b2


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=20),
        min_size=2,
        max_size=5,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_repeated_span_pairs_matches_naive(spark, docs, k):
    """repeated_span_pairs (fp equi-join + diagonal run-merge) must
    equal the brute-force definition — all matched k-windows grouped by
    diagonal, consecutive positions merged into maximal runs — for ANY
    corpus over a tiny alphabet (which forces shared spans, internal
    repetition, and overlapping diagonals)."""
    from collections import defaultdict

    from real_time_financial_market_data_pipeline_spark.operators.dedup import repeated_span_pairs

    def naive(a, b):
        by_diag = defaultdict(list)
        for i in range(len(a) - k + 1):
            for j in range(len(b) - k + 1):
                if a[i : i + k] == b[j : j + k]:
                    by_diag[i - j].append(i)
        out = set()
        for d, poss in by_diag.items():
            poss.sort()
            start = prev = poss[0]
            for p in poss[1:] + [None]:
                if p == prev + 1:
                    prev = p
                else:
                    out.add((start + 1, start - d + 1, prev - start + k))
                    if p is not None:
                        start = prev = p
        return out

    expected = set()
    for ia in range(len(docs)):
        for ib in range(ia + 1, len(docs)):
            for s_a, s_b, n in naive(docs[ia], docs[ib]):
                expected.add((ia, ib, s_a, s_b, n))

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in repeated_span_pairs(df, k=k).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=16),
        min_size=2,
        max_size=5,
    ),
)
def test_excise_common_spans_invariants(spark, docs):
    """The keep-one excision treatment, on ANY corpus: the output is
    EXACTLY the input with every non-representative occurrence's token
    positions deleted, EXCEPT positions protected by any representative
    occurrence (overlapping-rep guarantee, round-8 ADVICE) — full
    deterministic reconstruction against a Python reference.  This also
    pins the documented splice artifact (flanks joining may re-form
    k-grams, but never resurrect deleted POSITIONS), excised_tokens
    accounting, untouched-doc identity, and that every excised span's
    canonical occurrence survives INTACT in its rep doc."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import common_spans, excise_common_spans

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    spans = common_spans(df, k=k, min_docs=2).localCheckpoint(eager=True)
    span_rows = spans.collect()
    out = {r["doc_id"]: r for r in excise_common_spans(df, spans, k=k).collect()}

    def windows(toks):
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    # Python reference: covered = every non-representative occurrence of
    # every common span, MINUS positions of any representative window
    covered: dict[int, set] = {i: set() for i in range(len(docs))}
    protected: dict[int, set] = {i: set() for i in range(len(docs))}
    for sr in span_rows:
        target = sr["span_text"]
        for i, toks in enumerate(docs):
            for pos0, w in enumerate(windows(toks)):
                pos = pos0 + 1  # operator positions are 1-based
                if w == target:
                    if i == sr["rep_id"] and pos == sr["rep_pos"]:
                        protected[i].update(range(pos, pos + k))
                    else:
                        covered[i].update(range(pos, pos + k))

    span_texts = {sr["span_text"] for sr in span_rows}
    for i, toks in enumerate(docs):
        row = out[i]
        got_toks = row["text"].split() if row["text"] else []
        drop = covered[i] - protected[i]
        expected = [t for p, t in enumerate(toks, 1) if p not in drop]
        assert got_toks == expected, (i, got_toks, expected)
        assert row["excised_tokens"] == len(toks) - len(got_toks)
        assert row["excised_tokens"] >= 0
        if not any(w in span_texts for w in windows(toks)):
            assert got_toks == toks  # untouched doc is identical

    # canonical-occurrence survival: the rep window's k positions are all
    # kept and contiguous in the input, so the span text must re-appear
    # verbatim in the rep doc's output — the guarantee the pre-protection
    # form could not make under overlapping span families
    for sr in span_rows:
        rep_out = out[sr["rep_id"]]["text"].split() if out[sr["rep_id"]]["text"] else []
        assert sr["span_text"] in windows(rep_out), (sr, rep_out)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=14),
        min_size=1,
        max_size=6,
    ),
    assignment=st.lists(st.integers(min_value=0, max_value=2), min_size=6, max_size=6),
)
def test_merge_span_stats_is_exact_for_any_batching(spark, docs, assignment):
    """The incremental span index's foundational claim, property-tested
    directly: for ANY partitioning of a corpus into batches, merging
    the per-batch partial aggregates (merge_span_stats: summed counts,
    min-of-mins representative) is ROW-IDENTICAL to computing the
    per-fingerprint stats over the whole corpus at once — because each
    doc_id lives in exactly one batch.  This is what lets
    common_spans_view skip re-fingerprinting history."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import _common_span_stats
    from real_time_financial_market_data_pipeline_spark.streaming.incremental import merge_span_stats

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    whole = spark.createDataFrame(rows, "doc_id long, text string")
    expected = sorted(
        tuple(r) for r in _common_span_stats(whole, "doc_id", "text", k, 1).collect()
    )

    batches: dict[int, list] = {}
    for i, row in enumerate(rows):
        batches.setdefault(assignment[i % len(assignment)], []).append(row)
    partials = None
    for batch_rows in batches.values():
        bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")
        p = _common_span_stats(bdf, "doc_id", "text", k, 1)
        partials = p if partials is None else partials.unionByName(p)
    got = sorted(tuple(r) for r in merge_span_stats(partials).collect())
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=20),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_internal_repeated_spans_matches_naive(spark, docs, k):
    """internal_repeated_spans must equal the brute-force definition —
    all within-doc matched k-window pairs (i < j) grouped by diagonal,
    consecutive positions merged into maximal runs — for ANY document
    over a tiny alphabet (forcing heavy internal repetition and
    overlapping diagonals)."""
    from collections import defaultdict

    from real_time_financial_market_data_pipeline_spark.operators.dedup import internal_repeated_spans

    def naive(a):
        by_diag = defaultdict(list)
        for i in range(len(a) - k + 1):
            for j in range(i + 1, len(a) - k + 1):
                if a[i : i + k] == a[j : j + k]:
                    by_diag[i - j].append(i)
        out = set()
        for d, poss in by_diag.items():
            poss.sort()
            start = prev = poss[0]
            for p in poss[1:] + [None]:
                if p == prev + 1:
                    prev = p
                else:
                    out.add((start + 1, start - d + 1, prev - start + k))
                    if p is not None:
                        start = prev = p
        return out

    expected = {
        (i, s_a, s_b, n)
        for i, toks in enumerate(docs)
        for s_a, s_b, n in naive(toks)
    }
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in internal_repeated_spans(df, k=k).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    train=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=16),
        min_size=1,
        max_size=4,
    ),
    bench=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=10),
        min_size=1,
        max_size=2,
    ),
)
def test_excise_contaminated_spans_invariants(spark, train, bench):
    """Surgical decontamination on ANY train/benchmark pair: the output
    is EXACTLY the input with every position covered by a
    benchmark-matching k-window deleted (full reconstruction vs a
    Python reference — no protection set, benchmark text has no
    keep-one right), rows preserved, clean docs identical."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import excise_contaminated_spans

    k = 3
    tdf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(train)],
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        [(100 + i, " ".join(toks)) for i, toks in enumerate(bench)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in excise_contaminated_spans(tdf, bdf, k=k).collect()}

    def windows(toks):
        return [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    bad = {w for toks in bench for w in windows(toks)}
    for i, toks in enumerate(train):
        covered: set = set()
        for pos0, w in enumerate(windows(toks)):
            if w in bad:
                covered.update(range(pos0 + 1, pos0 + 1 + k))
        got_toks = out[i]["text"].split() if out[i]["text"] else []
        expected = [t for p, t in enumerate(toks, 1) if p not in covered]
        assert got_toks == expected, (i, got_toks, expected)
        assert out[i]["excised_tokens"] == len(toks) - len(got_toks)
        if not covered:
            assert got_toks == toks


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=18),
        min_size=1,
        max_size=4,
    ),
)
def test_excise_internal_repeats_invariants(spark, docs):
    """Keep-first within-doc excision, on ANY corpus — BOTH treatments:
    the concatenating form's output is EXACTLY the input with every
    non-first occurrence's positions deleted, minus positions protected
    by any first occurrence (full reconstruction vs a Python
    reference), with every repeated window surviving intact; the SPLIT
    form emits exactly the maximal runs of the same kept positions, so
    its chunks are verbatim substrings of the original."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        excise_internal_repeats,
        split_excise_internal_repeats,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in excise_internal_repeats(df, k=k).collect()}
    split_out: dict[int, list] = {}
    for r in split_excise_internal_repeats(df, k=k).collect():
        split_out.setdefault(r["doc_id"], []).append(r)

    def windows(toks):
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    for i, toks in enumerate(docs):
        occ: dict[str, list] = {}
        for pos0, w in enumerate(windows(toks)):
            occ.setdefault(w, []).append(pos0 + 1)
        covered: set = set()
        protected: set = set()
        repeated = {w for w, ps in occ.items() if len(ps) >= 2}
        for w in repeated:
            first, *rest = occ[w]
            protected.update(range(first, first + k))
            for p in rest:
                covered.update(range(p, p + k))
        drop = covered - protected
        got_toks = out[i]["text"].split() if out[i]["text"] else []
        expected = [t for p, t in enumerate(toks, 1) if p not in drop]
        assert got_toks == expected, (i, got_toks, expected)
        assert out[i]["excised_tokens"] == len(toks) - len(got_toks)
        if not repeated:
            assert got_toks == toks
        # keep-first survival: each repeated window intact in the output
        for w in repeated:
            assert w in windows(got_toks), (i, w, got_toks)

        # split form: chunks == maximal runs of the same kept positions
        runs, cur = [], []
        for p in range(1, len(toks) + 1):
            if p in drop:
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(p)
        if cur:
            runs.append(cur)
        chunks = sorted(split_out.get(i, []), key=lambda r: r["chunk_idx"])
        assert [
            (r["token_start"], r["text"].split() if r["text"] else [])
            for r in chunks
        ] == [(run[0], [toks[p - 1] for p in run]) for run in runs], (i,)
        for r in chunks:  # verbatim-substring guarantee
            ctoks = r["text"].split()
            assert ctoks == list(
                toks[r["token_start"] - 1 : r["token_start"] - 1 + len(ctoks)]
            )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=16),
        min_size=2,
        max_size=5,
    ),
)
def test_merged_common_spans_coverage_identity(spark, docs):
    """merged_common_spans on ANY corpus: per rep doc, the union of
    merged-block positions is IDENTICAL to the union of fragment-window
    positions from common_spans (nothing gained, nothing lost by the
    run-merge); each merged row is internally consistent (span_tokens =
    n_windows + k - 1, span_text is the rep doc's verbatim slice);
    n_windows totals the fragment count.  Note merged EXTENTS may
    overlap by up to k-1 tokens (two runs whose rep positions sit
    closer than k apart) — only the rep POSITIONS partition."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        common_spans,
        merged_common_spans,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    frags = common_spans(df, k=k, min_docs=2).collect()
    merged = merged_common_spans(df, k=k, min_docs=2).collect()

    frag_cover: dict[int, set] = {}
    for r in frags:
        frag_cover.setdefault(r["rep_id"], set()).update(
            range(r["rep_pos"], r["rep_pos"] + k)
        )
    merged_cover: dict[int, set] = {}
    for r in merged:
        cover = set(range(r["span_start"], r["span_start"] + r["span_tokens"]))
        merged_cover.setdefault(r["rep_id"], set()).update(cover)
        assert r["span_tokens"] == r["n_windows"] + k - 1
        assert r["span_text"].split() == list(
            docs[r["rep_id"]][r["span_start"] - 1 : r["span_start"] - 1 + r["span_tokens"]]
        )
        assert r["n_docs_min"] <= r["n_docs_max"]
    assert merged_cover == frag_cover
    assert sum(r["n_windows"] for r in merged) == len(frags)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=16),
        min_size=2,
        max_size=5,
    ),
)
def test_split_excise_common_spans_invariants(spark, docs):
    """Splice-safety, on ANY corpus (round-8 VERDICT task 1): every
    output chunk of the split treatment is exactly one maximal run of
    kept positions (full reconstruction against the same Python
    reference as the concat form), hence a verbatim token-substring of
    its original document — so with keep_representative=False NO chunk
    anywhere contains ANY excised-span k-gram (the guarantee the
    concatenating form provably cannot make), and with True an excised
    k-gram appears in a chunk ONLY at rep-protected positions."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        common_spans,
        split_excise_common_spans,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    spans = common_spans(df, k=k, min_docs=2).localCheckpoint(eager=True)
    span_rows = spans.collect()
    span_texts = {sr["span_text"] for sr in span_rows}

    def windows(toks):
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    # Python reference position sets (same model as the concat test)
    covered: dict[int, set] = {i: set() for i in range(len(docs))}
    protected: dict[int, set] = {i: set() for i in range(len(docs))}
    for sr in span_rows:
        for i, toks in enumerate(docs):
            for pos0, w in enumerate(windows(toks)):
                pos = pos0 + 1
                if w == sr["span_text"]:
                    if i == sr["rep_id"] and pos == sr["rep_pos"]:
                        protected[i].update(range(pos, pos + k))
                    else:
                        covered[i].update(range(pos, pos + k))

    def expected_chunks(i, drop):
        """Maximal runs of kept 1-based positions → (start, tokens)."""
        runs, cur = [], []
        for p in range(1, len(docs[i]) + 1):
            if p in drop:
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(p)
        if cur:
            runs.append(cur)
        return [(r[0], [docs[i][p - 1] for p in r]) for r in runs]

    for keep_rep in (True, False):
        got = {}
        rows = split_excise_common_spans(
            df, spans, k=k, keep_representative=keep_rep
        ).collect()
        for r in rows:
            got.setdefault(r["doc_id"], []).append(r)
        for i in range(len(docs)):
            drop = (covered[i] - protected[i]) if keep_rep else (covered[i] | protected[i])
            exp = expected_chunks(i, drop)
            chunks = sorted(got.get(i, []), key=lambda r: r["chunk_idx"])
            assert [r["chunk_idx"] for r in chunks] == list(range(len(exp)))
            assert [
                (r["token_start"], r["text"].split() if r["text"] else [], r["n_tokens"])
                for r in chunks
            ] == [(s, t, len(t)) for s, t in exp], (i, keep_rep)
            # splice-safety: chunk k-grams exist at the same original slot
            for r in chunks:
                ctoks = r["text"].split()
                assert ctoks == list(
                    docs[i][r["token_start"] - 1 : r["token_start"] - 1 + len(ctoks)]
                )
                for j, w in enumerate(windows(ctoks)):
                    if w in span_texts:
                        pos = r["token_start"] + j
                        assert keep_rep and set(range(pos, pos + k)) <= protected[i], (
                            i, w, pos,
                        )


# --- excise-verify subset soundness (round 9) -------------------------
# The streaming decontam verify pass (IncrementalDedupJob.excise_verify)
# re-detects over ONLY the docs the excision rewrote, relying on: a doc
# the detection join left untouched keeps its ORIGINAL bytes, so it
# cannot be contaminated after the pass; and any doc with a hit always
# reports excised_tokens > 0 (no protection set in decontamination).
# Adversarial small-alphabet texts maximize self-overlap, the regime
# where concat splices actually happen.

_tiny_words = st.sampled_from(["aa", "bb", "cc"])
_doc_strategy = st.lists(
    st.lists(_tiny_words, min_size=1, max_size=14).map(" ".join),
    min_size=1,
    max_size=8,
)
_bench_strategy = st.lists(_tiny_words, min_size=3, max_size=3).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_doc_strategy, bench_text=_bench_strategy)
def test_excise_verify_subset_is_sound(spark, texts, bench_text):
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        excise_contaminated_spans,
        span_contaminated_ids,
    )

    k = 3
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(900, bench_text)], "doc_id long, text string")

    rewritten = excise_contaminated_spans(train, bench, k=k)
    out = {r["doc_id"]: r for r in rewritten.collect()}
    # every input row preserved
    assert sorted(out) == list(range(len(texts)))

    # docs the detection rule flags BEFORE excision always report a
    # removal (hits => excised_tokens > 0: no protected positions)
    flagged_before = {
        r["doc_id"]
        for r in span_contaminated_ids(train, bench, k=k).collect()
    }
    for d in flagged_before:
        assert out[d]["excised_tokens"] > 0, (d, out[d])

    # SUBSET SOUNDNESS: any doc still contaminated after excision (a
    # concat splice) must be one the pass rewrote — so re-checking only
    # excised docs catches every survivor
    flagged_after = {
        r["doc_id"]
        for r in span_contaminated_ids(rewritten, bench, k=k).collect()
    }
    for d in flagged_after:
        assert out[d]["excised_tokens"] > 0, (
            f"doc {d} is contaminated post-excision but was never "
            f"rewritten — the verify pass would miss it"
        )

    # and the verify treatment (drop the survivors) yields a corpus
    # clean under the rule — the streaming hard guarantee, batch form
    survivors = spark.createDataFrame(
        [(d,) for d in flagged_after] or [(None,)], "doc_id long"
    ).dropna()
    cleaned = rewritten.join(survivors, "doc_id", "left_anti")
    assert span_contaminated_ids(cleaned, bench, k=k).count() == 0


_delta_doc = st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=16)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    old_docs=st.lists(_delta_doc, min_size=1, max_size=5),
    new_docs=st.lists(_delta_doc, min_size=0, max_size=4),
)
def test_delta_finalize_unaffected_docs_are_invariant(spark, old_docs, new_docs):
    """The soundness LEMMA the incremental finalize rests on
    (streaming.curation._redo_docs), property-tested directly without
    the streaming machinery: take any old corpus and any batch of new
    docs; compute the qualifying span sets before and after; call a
    span fp CHANGED when it newly qualifies or its (rep_id, rep_pos)
    moved; call an old doc AFFECTED when its posting rows intersect
    the changed fps.  Then every UNAFFECTED old doc must produce
    byte-identical split-excision chunks under the old and the new
    span sets — which is exactly why the delta cut may skip it.  New
    doc_ids are drawn BELOW the old ones so representative moves (the
    subtle change vector) actually occur."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        _common_span_stats,
        span_fingerprints,
        split_excise_common_spans,
    )

    k, min_docs = 3, 2
    old_rows = [(100 + i, " ".join(toks)) for i, toks in enumerate(old_docs)]
    new_rows = [(i, " ".join(toks)) for i, toks in enumerate(new_docs)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    both = spark.createDataFrame(old_rows + new_rows, "doc_id long, text string")

    def qualifying(df):
        return (
            _common_span_stats(df, "doc_id", "text", k, min_docs)
            .select("fp", "rep_id", "rep_pos")
        )

    q_old, q_new = qualifying(old), qualifying(both)
    changed = (
        q_new.join(
            q_old.select(
                "fp",
                F.col("rep_id").alias("_orid"),
                F.col("rep_pos").alias("_orpos"),
            ),
            "fp",
            "left",
        )
        .filter(
            F.col("_orid").isNull()
            | (F.col("rep_id") != F.col("_orid"))
            | (F.col("rep_pos") != F.col("_orpos"))
        )
        .select("fp")
    )
    postings = (
        span_fingerprints(old, id_col="doc_id", text_col="text", k=k)
        .select("fp", F.col("id").alias("doc_id"))
        .distinct()
    )
    affected = postings.join(changed, "fp").select("doc_id").distinct()
    unaffected = old.join(affected, "doc_id", "left_anti")

    under_new = sorted(
        tuple(r)
        for r in split_excise_common_spans(unaffected, q_new, k=k).collect()
    )
    under_old = sorted(
        tuple(r)
        for r in split_excise_common_spans(unaffected, q_old, k=k).collect()
    )
    assert under_new == under_old


def test_minhash_signature_is_not_degenerate(spark):
    """Round-10 regression: the affine derivation must yield k DISTINCT
    quasi-permutations.  The original scheme reduced mod 2^61-1 with
    operands that never reached the modulus, so every h_i was monotone
    in the base hash and all k entries picked the same argmin shingle —
    signature_jaccard collapsed to a {0, 1} Bernoulli coin.  With a
    working family, two texts sharing a 7-token footer out of ~20
    tokens (true shingle-Jaccard ~0.15) must estimate strictly BETWEEN
    0 and 1 — some signature slots agree (the shared footer wins some
    permutations), most don't."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        signature_jaccard,
    )

    boiler = "all rights reserved by the example company"
    df = spark.createDataFrame(
        [
            (5, "the annual report opens with strong results before " + boiler
                + " and then details the quarter by segment"),
            (10, "a third unrelated mailing also ends with " + boiler
                 + " right above the postal permit line"),
        ],
        "doc_id long, text string",
    )
    sigs = {
        r["id"]: r["sig"]
        for r in banded_signatures(df, num_hashes=64, bands=4)
        .select("id", "sig")
        .dropDuplicates(["id"])
        .collect()
    }
    matches = sum(a == b for a, b in zip(sigs[5], sigs[10]))
    # true J ~ 0.15: expect ~10/64 agreeing slots; degenerate scheme
    # gives exactly 0 or exactly 64
    assert 0 < matches < 32, matches
    est = (
        spark.createDataFrame([(sigs[5], sigs[10])], "a array<bigint>, b array<bigint>")
        .select(signature_jaccard(F.col("a"), F.col("b")).alias("j"))
        .first()["j"]
    )
    assert 0.0 < est < 0.5, est


def test_streaming_near_dup_keeps_footer_sharers(spark, tmp_path):
    """Round-10 regression, the user-visible symptom: three docs that
    share ONLY a boilerplate footer (true Jaccard ~0.15) must ALL
    survive IncrementalDedupJob's near-dup gate — the degenerate
    signatures estimated 1.0 whenever the shared footer happened to
    contain the min-hash shingle, silently dropping distinct
    documents at ingest."""
    import json as _json
    import os as _os
    import time as _time

    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream
    from real_time_financial_market_data_pipeline_spark.streaming.incremental import (
        IncrementalDedupJob,
        corpus_view,
    )

    boiler = "all rights reserved by the example company"
    docs = [
        {"doc_id": 5, "text": "the annual report opens with strong results before "
                              + boiler + " and then details the quarter by segment"},
        {"doc_id": 6, "text": "an entirely different newsletter closes its final page with "
                              + boiler + " printed beneath the signature block today"},
        {"doc_id": 10, "text": "a third unrelated mailing also ends with "
                               + boiler + " right above the postal permit line"},
    ]
    feed = str(tmp_path / "feed")
    _os.makedirs(feed)
    base = _time.time() - 3
    for i, d in enumerate(docs):
        p = _os.path.join(feed, f"d{i}.json")
        with open(p, "w") as fh:
            fh.write(_json.dumps(d) + "\n")
        _os.utime(p, (base + i, base + i))
    job = IncrementalDedupJob(out_dir=str(tmp_path / "out"))
    q = job.start(read_doc_stream(spark, feed, max_files_per_trigger=1).select("doc_id", "text"))
    assert q.awaitTermination(180)
    kept = sorted(r["doc_id"] for r in corpus_view(spark, str(tmp_path / "out")).collect())
    assert kept == [5, 6, 10], kept


def test_banded_lsh_candidate_rate_follows_theory(spark):
    """The quantitative seal on the round-10 minhash fix: for 200
    disjoint-vocabulary doc pairs built to exact shingle-Jaccard 0.5,
    the banded candidate rate (any of b=4 bands of r=4 rows agreeing)
    must sit near the LSH theory value 1-(1-J^r)^b = 0.227 — NOT near
    J itself, which is what the degenerate one-permutation scheme
    produced (all bands agree exactly when the single min-hash shingle
    is shared, probability J = 0.5).  The pre-fix recall pins missed
    the bug because they only floored recall from below; this test
    bounds the rate from BOTH sides.  Construction: 20-token docs
    sharing a 14-token prefix -> 12 of 18 3-shingles shared on each
    side -> J = 12/(18+18-12) = 0.5 exactly."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        signature_jaccard,
    )

    rows = []
    for p in range(200):
        base = [f"p{p}w{i}" for i in range(20)]
        alt = base[:14] + [f"p{p}x{i}" for i in range(6)]
        rows.append((2 * p, " ".join(base)))
        rows.append((2 * p + 1, " ".join(alt)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bands_df = banded_signatures(df, num_hashes=16, bands=4).cache()

    l, r = bands_df.alias("l"), bands_df.alias("r")
    cand_pairs = {
        row["a"]
        for row in l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") + 1 == F.col("r.id"))
            & (F.col("l.id") % 2 == 0),
        )
        .select(F.col("l.id").alias("a"))
        .distinct()
        .collect()
    }
    n_cand = len(cand_pairs)
    # theory 0.227*200 = 45.5 (sd ~5.9); degenerate scheme gives ~100
    assert 20 <= n_cand <= 75, n_cand

    # estimator calibration: per-pair estimates must populate the open
    # interval, not just the Bernoulli endpoints, and average near J
    sigs = {
        row["id"]: row["sig"]
        for row in bands_df.select("id", "sig").dropDuplicates(["id"]).collect()
    }
    est_rows = spark.createDataFrame(
        [(sigs[2 * p], sigs[2 * p + 1]) for p in range(200)],
        "a array<bigint>, b array<bigint>",
    ).select(signature_jaccard(F.col("a"), F.col("b")).alias("j")).collect()
    ests = [row["j"] for row in est_rows]
    assert sum(0.0 < e < 1.0 for e in ests) > 100, "estimates collapsed to {0,1}"
    mean = sum(ests) / len(ests)
    assert 0.4 <= mean <= 0.6, mean


def test_signature_jaccard_concentration_hoeffding(spark):
    """Round-11 VERDICT task 4: the quantitative guard the round-10
    universal-family fix made possible.  The k-slot estimator is a mean
    of k {0,1} indicators with P(agree)=J, so Hoeffding gives
    P(|est - J| >= t) <= 2*exp(-2*k*t^2).  For k=64, t=0.15 that is
    ~0.112.  Over 300 disjoint-vocabulary pairs built to EXACT
    shingle-Jaccard J (three J levels), the empirical violation rate
    must respect the bound (x1.5 sampling slack), and the empirical
    standard error must sit near the binomial value sqrt(J(1-J)/k) —
    bounded from BOTH sides: a degenerate one-permutation family
    concentrates at sd ~ sqrt(J(1-J)) (all-or-nothing, ~6x too wide),
    while a constant estimator has sd 0 (too narrow to be a k-sample
    estimate).

    Construction (as in the candidate-rate test): 20-token docs over a
    per-pair vocabulary sharing an m-token prefix -> J = s/(36-s) with
    s = m-2 shared 3-shingles of 18 per side."""
    import math

    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        signature_jaccard,
    )

    K = 64
    N = 300
    # m-token shared prefix -> s = m-2 shared shingles, J = s/(36-s)
    levels = {14: 12 / 24, 11: 9 / 27, 17: 15 / 21}  # J = 0.5, 1/3, ~0.714
    for m, true_j in levels.items():
        rows = []
        for p in range(N):
            base = [f"m{m}p{p}w{i}" for i in range(20)]
            alt = base[:m] + [f"m{m}p{p}x{i}" for i in range(20 - m)]
            rows.append((2 * p, " ".join(base)))
            rows.append((2 * p + 1, " ".join(alt)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = {
            r["id"]: r["sig"]
            for r in banded_signatures(df, num_hashes=K, bands=4)
            .select("id", "sig")
            .dropDuplicates(["id"])
            .collect()
        }
        ests = [
            r["j"]
            for r in spark.createDataFrame(
                [(sigs[2 * p], sigs[2 * p + 1]) for p in range(N)],
                "a array<bigint>, b array<bigint>",
            )
            .select(signature_jaccard(F.col("a"), F.col("b")).alias("j"))
            .collect()
        ]
        t = 0.15
        hoeffding = 2 * math.exp(-2 * K * t * t)  # 0.112 at k=64
        violations = sum(abs(e - true_j) >= t for e in ests) / N
        assert violations <= 1.5 * hoeffding, (m, true_j, violations)
        mean = sum(ests) / N
        assert abs(mean - true_j) <= 3 * math.sqrt(true_j * (1 - true_j) / K), (
            m, true_j, mean,
        )
        sd = math.sqrt(sum((e - mean) ** 2 for e in ests) / (N - 1))
        binom_sd = math.sqrt(true_j * (1 - true_j) / K)
        # both sides: 0.5x catches a collapsed (constant) estimator,
        # 2x catches the degenerate Bernoulli coin (sd ~ 8x binomial)
        assert 0.5 * binom_sd <= sd <= 2.0 * binom_sd, (m, true_j, sd, binom_sd)
