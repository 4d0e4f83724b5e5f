from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv, ohlcv_1h, ohlcv_5m
from real_time_financial_market_data_pipeline_spark.operators.latest import latest_prices
from real_time_financial_market_data_pipeline_spark.operators.topk import top_k_per_group
from real_time_financial_market_data_pipeline_spark.operators.dedup import (
    common_spans,
    decontaminate_spans,
    exact_dedup,
    merged_common_spans,
    excise_common_spans,
    excise_contaminated_spans,
    excise_internal_repeats,
    internal_repeated_spans,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    repeated_span_pairs,
    simhash_signatures,
    split_excise_common_spans,
    split_excise_internal_repeats,
)
from real_time_financial_market_data_pipeline_spark.operators.asof import asof_join
from real_time_financial_market_data_pipeline_spark.operators.similarity import (
    brute_force_knn,
    lsh_bucketed_knn,
)

__all__ = [
    "ohlcv",
    "ohlcv_5m",
    "ohlcv_1h",
    "latest_prices",
    "top_k_per_group",
    "exact_dedup",
    "common_spans",
    "merged_common_spans",
    "decontaminate_spans",
    "excise_common_spans",
    "excise_contaminated_spans",
    "excise_internal_repeats",
    "internal_repeated_spans",
    "split_excise_common_spans",
    "split_excise_internal_repeats",
    "repeated_span_pairs",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "asof_join",
    "brute_force_knn",
    "lsh_bucketed_knn",
]
