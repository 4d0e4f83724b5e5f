"""Contract tests for the driver-facing surface (__spark_entry__).

The driver evaluates only the first DRIVER_WINDOW entries of queries()
against oracle_sql(); anything registered past the window gets no
correctness row at all (round-1 lesson: 11 oracle-backed queries were
registered at positions 51-61 and went unverified).
"""

from __future__ import annotations

import __spark_entry__ as entry
from real_time_financial_market_data_pipeline_spark.serving.queries import DRIVER_WINDOW


def test_every_oracle_backed_query_inside_driver_window():
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    window = set(names[:DRIVER_WINDOW])
    outside = [n for n in oracles if n not in window]
    assert not outside, (
        f"oracle-backed queries registered past position {DRIVER_WINDOW} "
        f"would get no driver correctness row: {outside}"
    )


def test_oracle_keys_are_registered_queries():
    names = set(entry.queries())
    assert set(entry.oracle_sql()) <= names


def test_rows_only_tail_is_documented_families():
    """Every no-oracle query must be one of the by-design rows-only
    families (probabilistic recall / sketches / hash-specific output),
    not an accidentally-unverified query."""
    rows_only = set(entry.queries()) - set(entry.oracle_sql())
    allowed_prefixes = (
        "minhash_",
        "simhash_",
        "approx_",
        "media_decode",
        "embedding_near_dups_lsh",
        "knn_ivf",
        "knn_lsh",
        "price_path_correlation_blocked",
        # oracle slot traded to approx_soundness_certificates (round-2
        # VERDICT task 3); equality with the oracle-backed all-pairs
        # form pinned in tests/test_certificates.py
        "fuzzy_name_pairs_blocked",
        # minhash-seeded membership (cross-corpus bands); planted
        # contamination certified driver-visibly via the
        # planted_contamination_survived leg of
        # approx_soundness_certificates
        "decontaminated_docs",
    )
    stray = [n for n in rows_only if not n.startswith(allowed_prefixes)]
    assert not stray, f"rows-only queries outside the documented families: {stray}"
