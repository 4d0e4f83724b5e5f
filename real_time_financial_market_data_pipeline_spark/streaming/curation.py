"""End-to-end curated-corpus pipeline (round-9 VERDICT task 2): the
composition a training-data user would actually run, wiring the whole
span machinery into ONE flow —

  ingest stream
    └─ within-document repeat repair  (repair_internal, keep-first)
    └─ surgical benchmark decontamination (excise + splice verify)
    └─ exact + near dedup vs the incremental LSH index
    └─ span-fp index accumulation (+ auto-compaction cadence)
  finalize (stream-stopped OPTIMIZE)
    └─ splice-safe cross-doc span excision OFF THE INDEX
    └─ quality / repetition gate       └─ PII redaction
    └─ deterministic train/val/test split → curated/ (partition=split)

ORDERING is the load-bearing design decision (this is where the
composition bugs live):

  1. WITHIN-DOC repair runs FIRST, inside the ingest batch, BEFORE
     fingerprinting (`IncrementalDedupJob.repair_internal`).  Every
     index — dedup fingerprints, LSH bands, span-fp positions — is
     then built on the repaired text, so the stream-stopped excision
     pass can consume the span index without any position drift.
     Running repair AFTER ingest (the naive reading of the stage list)
     would rewrite text the span index had already fingerprinted:
     rep_pos would point into stale token space and the index-driven
     excision would slice the wrong spans.
  2. DECONTAMINATION runs AFTER repair (IncrementalDedupJob step 0):
     repair's concatenating rebuild can in principle splice NEW
     k-grams, including benchmark ones — detection must therefore see
     the post-repair text, and excise_verify re-checks the excised
     docs, so the corpus is clean under the detection rule from the
     first byte with a HARD guarantee.
  3. CROSS-DOC excision runs stream-stopped in split mode
     (`split_excise_common_spans`): chunks are verbatim substrings of
     the indexed text, so no k-gram — benchmark or boilerplate — can
     form that was not already present and verified clean.  The spans
     come from `common_spans_view` (the incremental index), which
     validates span_k against the on-disk `_span_spec.json` marker —
     a window-size mismatch raises instead of slicing wrong text.
  4. The quality/repetition gate and PII redaction run on the FINAL
     chunk text (what a training job reads); the split is hashed on
     doc_id so all chunks of a document land in the same split (no
     train/val leakage through shared provenance).

Scale: the streaming phase is `IncrementalDedupJob`'s per-batch
envelope (map-side fingerprinting + band/fp equi-joins, flat in corpus
size; `compact_every` bounds directory listings).  The finalize pass is
one fingerprint sweep of the corpus (inside split excision) + one fp
equi-join against the index-served spans + map-side metric projection —
no pair enumeration anywhere.

Reference parity note: the reference pipeline curates market ticks
(validate → dedup → gold), not documents; this module is the
LLM-data-pipeline extension of the same medallion shape
(reference src/consumer/spark_processor.py:61-133 is the
ingest-validate-publish analogue).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from real_time_financial_market_data_pipeline_spark.functions.text import (
    detect_lang,
    quality_score,
    redact_pii,
    repetition_metrics,
    token_count,
)
from real_time_financial_market_data_pipeline_spark.operators.sampling import train_val_test_split
from real_time_financial_market_data_pipeline_spark.streaming.incremental import (
    IncrementalDedupJob,
    common_spans_view,
    corpus_view,
)


@dataclass
class CuratedCorpusPipeline:
    """One-stop document curation: `start()` the streaming ingest
    phase, `finalize()` the stream-stopped excision/gate/split pass,
    read the result with `curated_view()`."""

    out_dir: str
    # --- decontamination (surgical, hard-verified) ---
    benchmark_fp_dir: str | None = None
    decontam_k: int = 13
    # --- within-document repair (pre-index, keep-first) ---
    internal_k: int = 8
    internal_min_occurrences: int = 2
    # --- near-dup index ---
    num_hashes: int = 16
    bands: int = 4
    threshold: float = 0.5
    shingle_n: int = 3
    # --- cross-doc span excision (off the incremental index) ---
    span_k: int = 8
    span_min_docs: int = 2
    # --- curation gate / split ---
    quality_min: float = 0.5
    max_dup_line_ratio: float = 0.3
    redact: bool = True
    val_frac: float = 0.1
    test_frac: float = 0.1
    # --- operations ---
    compact_every: int | None = 8
    trigger: dict = field(default_factory=lambda: {"availableNow": True})

    def job(self) -> IncrementalDedupJob:
        """The configured ingest job (exposed for compact()/inspection).
        Within-doc repair runs as the job's own first stage
        (repair_internal) rather than a pre_transform callback, so the
        job can FUSE the repair fingerprint pass with the span-fp index
        partial when internal_k == span_k (the default — round-10
        VERDICT task 2)."""
        return IncrementalDedupJob(
            out_dir=self.out_dir,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=self.threshold,
            shingle_n=self.shingle_n,
            benchmark_fp_dir=self.benchmark_fp_dir,
            decontam_k=self.decontam_k,
            decontam_mode="excise",
            excise_verify=True,
            span_index=True,
            span_k=self.span_k,
            repair_internal=True,
            internal_k=self.internal_k,
            internal_min_occurrences=self.internal_min_occurrences,
            compact_every=self.compact_every,
            trigger=self.trigger,
        )

    def start(self, docs: DataFrame) -> StreamingQuery:
        """Phase 1: stream (doc_id, text, ...) into the decontaminated,
        repaired, deduplicated corpus + its LSH and span-fp indexes."""
        return self.job().start(docs)

    def curated_dir(self) -> str:
        return os.path.join(self.out_dir, "curated")

    def finalize(self, spark) -> str:
        """Phase 2 (stream-stopped): writes `finalize_frame(spark)` to
        `curated/` partitioned by split (idempotent overwrite) and
        returns its path."""
        out_path = self.curated_dir()
        self.finalize_frame(spark).write.mode("overwrite").partitionBy(
            "split"
        ).parquet(out_path)
        return out_path

    def finalize_frame(self, spark) -> DataFrame:
        """The curated chunk table as a DataFrame (what `finalize`
        materializes): cross-doc span excision off the incremental
        index, quality/repetition gate, PII redaction, deterministic
        split.

        Output schema: (doc_id, chunk_idx, token_start, text,
        chunk_tokens, excised_tokens, internal_excised_tokens,
        decontam_excised_tokens, n_tokens, quality, lang_guess,
        repetition, split).  Untouched docs keep their ORIGINAL ingest
        bytes (detected by token-count identity — a doc whose single
        chunk kept every token was not excised, so the token-normalized
        rebuild is discarded in favor of the stored corpus text).

        Plan shape (pinned in tests/test_curation_pipeline.py): every
        join is an equi-join (fp / doc_id) — no cartesian or
        nested-loop operator anywhere; the metric/gate/redact/split
        stages are pure column projections fused into the upstream
        stages."""
        from real_time_financial_market_data_pipeline_spark.operators.dedup import (
            _tokens,
            split_excise_common_spans,
        )

        corpus = corpus_view(spark, self.out_dir)
        spans = common_spans_view(
            spark, self.out_dir, min_docs=self.span_min_docs, k=self.span_k
        )
        chunks = split_excise_common_spans(
            corpus.select("doc_id", "text"), spans, k=self.span_k
        )

        per_doc = Window.partitionBy("doc_id")
        provenance = [
            c
            for c in ("internal_excised_tokens", "decontam_excised_tokens")
            if c in corpus.columns
        ]
        orig = corpus.select(
            "doc_id",
            F.col("text").alias("_orig"),
            F.size(_tokens(F.col("text"))).alias("_orig_n"),
            *provenance,
        )
        restored = (
            chunks.withColumn("_n_chunks", F.count(F.lit(1)).over(per_doc))
            .withColumn("_kept_n", F.sum("n_tokens").over(per_doc))
            .join(orig, "doc_id")
            .select(
                "doc_id",
                "chunk_idx",
                "token_start",
                F.when(
                    (F.col("_n_chunks") == 1) & (F.col("n_tokens") == F.col("_orig_n")),
                    F.col("_orig"),
                )
                .otherwise(F.col("text"))
                .alias("text"),
                F.col("n_tokens").alias("chunk_tokens"),
                (F.col("_orig_n") - F.col("_kept_n")).alias("excised_tokens"),
                *provenance,
            )
        )

        # PII redaction BEFORE the metric projection (round-10 ADVICE):
        # the published n_tokens/quality/lang/repetition must describe
        # the text a training job actually reads — redacting after the
        # metrics let e.g. an email→[EMAIL] rewrite change the token
        # count the row claims.  chunk_tokens/token_start stay in
        # ORIGINAL token space by design (positional provenance against
        # the corpus and the span reports, not a property of the
        # published bytes).
        if self.redact:
            restored = restored.withColumn("text", redact_pii(F.col("text")))
        enriched = restored.select(
            "*",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
            detect_lang(F.col("text")).alias("lang_guess"),
            repetition_metrics(F.col("text")).alias("repetition"),
        )
        gated = enriched.filter(
            (F.col("quality") >= self.quality_min)
            & (F.col("repetition.dup_line_ratio") <= self.max_dup_line_ratio)
        )
        return train_val_test_split(
            gated, "doc_id", val_frac=self.val_frac, test_frac=self.test_frac
        )


def curated_view(spark, out_dir: str) -> DataFrame:
    """The finalized curated corpus (chunk rows, partition-pruned by
    split at the scan when filtered)."""
    path = os.path.join(out_dir, "curated")
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} does not exist — run CuratedCorpusPipeline.start() "
            "to drain the ingest stream, then .finalize(spark)"
        )
    return spark.read.parquet(path)
