from real_time_financial_market_data_pipeline_spark.functions.text import (
    detect_lang,
    doc_fingerprint,
    quality_score,
    token_count,
    tokens,
)
from real_time_financial_market_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)
from real_time_financial_market_data_pipeline_spark.functions.timeutils import (
    epoch_ms_to_timestamp,
    normalize_epoch_ms,
)

__all__ = [
    "tokens",
    "token_count",
    "quality_score",
    "detect_lang",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "epoch_ms_to_timestamp",
    "normalize_epoch_ms",
]
