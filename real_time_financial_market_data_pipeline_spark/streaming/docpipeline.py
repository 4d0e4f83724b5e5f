"""Streaming training-data curation: the LLM-pipeline operator family
(text metrics → exact dedup → quality gate → dataset split) run as ONE
Structured Streaming job over a document feed.

This is the streaming form of the batch doc_profile / dedup_exact_docs /
dataset_split queries — same column expressions (unified DataFrame API),
so batch and streaming curation can never drift.  State: the dedup
keeps one fingerprint per watermark horizon (bounded by ingest rate x
watermark, not corpus size); everything else is stateless projection.

Layout: raw/ keeps every arriving doc (audit); curated/ holds deduped,
quality-gated docs partitioned by split — the directory layout a
training job consumes (train/ val/ test/ prefixes prune at the scan).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.text import (
    repetition_metrics,
    detect_lang,
    doc_fingerprint,
    quality_score,
    redact_pii,
    token_count,
)
from real_time_financial_market_data_pipeline_spark.operators.sampling import train_val_test_split
from real_time_financial_market_data_pipeline_spark.streaming.sinks import SinkManager, parquet_sink


@dataclass
class DocStreamJob:
    """Wire a document stream to raw + curated parquet tables."""

    out_dir: str
    watermark: str = "10 minutes"
    quality_min: float = 0.5
    val_frac: float = 0.1
    test_frac: float = 0.1
    # mask emails/URLs/phone-like runs in curated text (raw/ keeps the
    # original for audit)
    redact: bool = True
    # intra-doc repetition gate (functions.text.repetition_metrics);
    # RefinedWeb drops > 0.3 duplicate-line share
    max_dup_line_ratio: float = 0.3
    trigger: dict = field(default_factory=lambda: {"availableNow": True})

    def checkpoints(self) -> str:
        return os.path.join(self.out_dir, "_checkpoints")

    def start(self, docs: DataFrame) -> SinkManager:
        marked = docs.withColumn("ingest_time", F.current_timestamp()).withWatermark(
            "ingest_time", self.watermark
        )
        enriched = marked.select(
            "*",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
            detect_lang(F.col("text")).alias("lang_guess"),
            doc_fingerprint(F.col("text")).alias("fingerprint"),
            repetition_metrics(F.col("text")).alias("repetition"),
        )
        # exact streaming dedup on content fingerprint: the FIRST arrival
        # survives; state bounded by the watermark horizon
        deduped = enriched.dropDuplicatesWithinWatermark(["fingerprint"])
        # quality gate + intra-doc repetition gate (RefinedWeb-style:
        # boilerplate/nav-chrome docs fail on dup_line_ratio even when
        # their token-level quality score looks fine)
        gated = deduped.filter(
            (F.col("quality") >= self.quality_min)
            & (F.col("repetition.dup_line_ratio") <= self.max_dup_line_ratio)
        )
        if self.redact:
            gated = gated.withColumn("text", redact_pii(F.col("text")))
        curated = train_val_test_split(
            gated,
            "doc_id",
            val_frac=self.val_frac,
            test_frac=self.test_frac,
        )

        mgr = SinkManager()
        mgr.add(
            parquet_sink(
                enriched,
                os.path.join(self.out_dir, "raw"),
                self.checkpoints(),
                "docs_raw",
                output_mode="append",
                trigger=self.trigger,
            )
        )
        mgr.add(
            parquet_sink(
                curated,
                os.path.join(self.out_dir, "curated"),
                self.checkpoints(),
                "docs_curated",
                output_mode="append",
                trigger=self.trigger,
                partition_by=["split"],
            )
        )
        return mgr

    def excise_spans(
        self,
        spark,
        k: int = 8,
        min_docs: int = 5,
        max_fp_docs: int | None = None,
        mode: str = "concat",
    ) -> str:
        """Stream-stopped span-dedup pass over the curated table (the
        Lee et al. 2022 treatment): find corpus-common k-token spans
        with `common_spans` (per-fingerprint aggregate — no pair
        enumeration) and rewrite each document with every occurrence
        excised EXCEPT the canonical representative, into
        `curated_excised/` (same split partitioning, so a training
        job swaps the directory and nothing else).

        Inherently a batch OPTIMIZE, not a streaming stage: "common
        across the corpus" is a two-pass property no single micro-batch
        can see.  Run it after a drain, like the compactions; re-runs
        overwrite (idempotent).  Returns the output path.

        `min_docs` tunes what counts as boilerplate; `max_fp_docs`
        (optional) additionally SKIPS ultra-common spans from excision
        cost accounting — normally unnecessary since excision never
        enumerates pairs.

        `mode` picks the treatment (round-8 VERDICT task 1):
        - "concat" (default): `excise_common_spans` — one row per doc,
          flanks joined; carries the documented splice artifact (new
          k-grams can form across the seam) but preserves row identity.
          Output: `curated_excised/`.
        - "split": `split_excise_common_spans` — documents split at
          every excision into chunk rows (doc_id, chunk_idx,
          token_start, text, n_tokens); NO k-gram can form that was not
          in the original, at the price of a fan-out schema.  Compose
          with operators.chunking downstream for context-length cuts.
          Output: `curated_excised_split/` (separate directory so both
          treatments can coexist; a training job points at whichever
          guarantee it needs).
        """
        from real_time_financial_market_data_pipeline_spark.operators.dedup import (
            common_spans,
            excise_common_spans,
            split_excise_common_spans,
        )

        if mode not in ("concat", "split"):
            raise ValueError(f"mode must be 'concat' or 'split' (got {mode!r})")
        curated_dir = os.path.join(self.out_dir, "curated")
        suffix = "curated_excised" if mode == "concat" else "curated_excised_split"
        out_path = os.path.join(self.out_dir, suffix)
        if not os.path.isdir(curated_dir):
            raise FileNotFoundError(
                f"{curated_dir} does not exist — the curation stream never "
                "wrote a batch (or out_dir is wrong); drain DocStreamJob "
                "before running the excision pass"
            )
        curated = spark.read.parquet(curated_dir)
        spans = common_spans(curated, k=k, min_docs=min_docs)
        if max_fp_docs is not None:
            spans = spans.filter(F.col("n_docs") <= max_fp_docs)
        if mode == "concat":
            rewritten = _preserve_untouched(
                excise_common_spans(curated.select("doc_id", "text"), spans, k=k),
                curated,
            )
        else:
            # curated already carries a DOC-level n_tokens metric; the
            # chunk-level count joins in as chunk_tokens
            rewritten = split_excise_common_spans(
                curated.select("doc_id", "text"), spans, k=k
            ).withColumnRenamed("n_tokens", "chunk_tokens")
        out = curated.drop("text").join(rewritten, "doc_id")
        out.write.mode("overwrite").partitionBy("split").parquet(out_path)
        return out_path

    def excise_internal(
        self, spark, k: int = 8, min_occurrences: int = 2, mode: str = "concat"
    ) -> str:
        """Stream-stopped within-document repair pass: every k-token
        window repeated >= min_occurrences times inside a document
        keeps its FIRST occurrence and loses the rest
        (operators.dedup.excise_internal_repeats) — the REPAIR
        counterpart to the repetition_metrics curation gate, which can
        only keep or drop whole documents.  Purely per-document (no
        corpus-wide state), but batch-run like excise_spans so the
        rewritten table lands once, atomically, after a drain.

        `mode` mirrors excise_spans: "concat" (default, one row per
        doc, splice artifact documented) writes
        `curated_excised_internal/`; "split" (splice-safe chunk rows
        via split_excise_internal_repeats) writes
        `curated_excised_internal_split/`.  Idempotent overwrite;
        returns the output path."""
        from real_time_financial_market_data_pipeline_spark.operators.dedup import (
            excise_internal_repeats,
            split_excise_internal_repeats,
        )

        if mode not in ("concat", "split"):
            raise ValueError(f"mode must be 'concat' or 'split' (got {mode!r})")
        curated_dir = os.path.join(self.out_dir, "curated")
        suffix = (
            "curated_excised_internal"
            if mode == "concat"
            else "curated_excised_internal_split"
        )
        out_path = os.path.join(self.out_dir, suffix)
        if not os.path.isdir(curated_dir):
            raise FileNotFoundError(
                f"{curated_dir} does not exist — the curation stream never "
                "wrote a batch (or out_dir is wrong); drain DocStreamJob "
                "before running the excision pass"
            )
        curated = spark.read.parquet(curated_dir)
        if mode == "concat":
            rewritten = _preserve_untouched(
                excise_internal_repeats(
                    curated.select("doc_id", "text"),
                    k=k,
                    min_occurrences=min_occurrences,
                ),
                curated,
            )
        else:
            rewritten = split_excise_internal_repeats(
                curated.select("doc_id", "text"), k=k, min_occurrences=min_occurrences
            ).withColumnRenamed("n_tokens", "chunk_tokens")
        out = curated.drop("text").join(rewritten, "doc_id")
        out.write.mode("overwrite").partitionBy("split").parquet(out_path)
        return out_path


def _preserve_untouched(rewritten: DataFrame, curated: DataFrame) -> DataFrame:
    """(doc_id, text, excised_tokens) with UNTOUCHED docs keeping their
    original curated bytes: the concatenating rebuild token-normalizes
    whatever it rebuilds, which is the right currency for the excised
    docs but a gratuitous lossy rewrite for the (typically vast)
    untouched majority — at corpus scale an excision pass must not
    degrade documents it didn't touch."""
    orig = curated.select("doc_id", F.col("text").alias("_orig"))
    return rewritten.join(orig, "doc_id").select(
        "doc_id",
        F.when(F.col("excised_tokens") > 0, F.col("text"))
        .otherwise(F.col("_orig"))
        .alias("text"),
        "excised_tokens",
    )
