"""Context-window document chunking — the step that turns curated
documents into training-ready sequences: fixed token-budget windows
with overlap (stride < window), so no content is lost at boundaries
and every chunk fits the model's context length.

Pure column expressions: tokens are staged once per document (HOF-CSE
rule, see operators.dedup), chunk starts come from a stride sequence,
and posexplode fans each document out to its chunks — row-expanding but
shuffle-free (a projection + generator, no aggregation), so it scales
as a map-side pass whatever the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.text import tokens as _tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): overlapping token windows
    of `chunk_tokens`, starting every `stride` tokens (overlap =
    chunk_tokens - stride).  The final chunk may be shorter; empty
    documents produce no chunks."""
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) would drop "
            "tokens between consecutive windows"
        )
    toks = df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_tk")).filter(
        F.size("_tk") > 0
    )
    starts = F.sequence(F.lit(0), F.size("_tk") - 1, F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(F.col("_tk"), s + 1, F.lit(chunk_tokens)))
    return (
        toks.select("id", F.posexplode(chunks).alias("chunk_idx", "_chunk"))
        .select(
            F.col("id").alias(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", "_chunk").alias("chunk_text"),
            F.size("_chunk").cast("long").alias("n_tokens"),
        )
    )
