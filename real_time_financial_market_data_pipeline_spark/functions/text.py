"""Text-analysis column functions (LLM-data-pipeline surface).

All pure JVM-side column expressions — no UDFs — so they stay inside
whole-stage codegen and are expressible 1:1 in ANSI SQL for the DuckDB
oracle. Language ID is a deterministic stopword-hit heuristic (the
container has no language-ID model; the heuristic is the operator —
swap the word lists for real per-language tables in production).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the heuristic language scorer.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
}

ENGLISH_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]


def tokens(text_col: Column) -> Column:
    """Lowercased word tokens; empty strings removed."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col)).cast("long")


def _count_in(toks: Column, words: list[str]) -> Column:
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def stopword_ratio(text_col: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(text_col)
    sw = _count_in(toks, stopwords or ENGLISH_STOPWORDS).cast("double")
    return F.when(F.size(toks) > 0, sw / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text_col: Column) -> Column:
    total = F.length(text_col)
    nonword = total - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return F.when(total > 0, nonword.cast("double") / total).otherwise(F.lit(0.0))


def mean_word_length(text_col: Column) -> Column:
    toks = tokens(text_col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(text_col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + word-length
    band + stopword presence − punctuation noise. The exact recipe is
    arbitrary; what matters is that it is reproducible and SQL-expressible.
    """
    n_tok = token_count(text_col)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 0.4).otherwise(0.0)
    mwl = mean_word_length(text_col)
    word_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 0.3).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(text_col) >= 0.01, 0.2).otherwise(0.0)
    punct_pen = F.when(punct_ratio(text_col) > 0.2, -0.2).otherwise(0.0)
    clean = F.when(punct_ratio(text_col) <= 0.2, 0.1).otherwise(0.0)
    return F.round(length_ok + word_ok + sw_ok + punct_pen + clean, 4)


def detect_lang(text_col: Column) -> Column:
    """Greatest-stopword-hit language guess over LANG_MARKERS; 'und' when
    no marker hits."""
    toks = tokens(text_col)
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    best = None
    for lang, score in scores.items():
        pair = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(score > best["score"], pair).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text_col: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set.

    Token-order/whitespace/punctuation insensitive — catches reformatted
    exact duplicates. md5 (not xxhash64) so any ANSI engine reproduces it.
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col)))))


# PII scrubbing — training-data hygiene before anything is tokenized.
# Deliberately conservative patterns (emails, URLs, long digit runs that
# look like phone/account numbers); all JVM-side regexp_replace chains.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"(?i)\bhttps?://[^\s]+"
_PHONEISH_RE = r"(?<!\d)(?:\+?\d[\d\s().-]{7,}\d)(?!\d)"


def redact_pii(
    text_col: Column,
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
    number_token: str = "<PHONE>",
) -> Column:
    """Mask emails, URLs, and phone-like digit runs with stable
    placeholder tokens.  Order matters: URLs first (they may contain
    @ and digits), then emails, then bare digit runs."""
    out = F.regexp_replace(text_col, _URL_RE, url_token)
    out = F.regexp_replace(out, _EMAIL_RE, email_token)
    out = F.regexp_replace(out, _PHONEISH_RE, number_token)
    return out


def pii_counts(text_col: Column) -> Column:
    """struct(n_emails, n_urls, n_phoneish) — audit columns for
    redaction coverage reports."""
    return F.struct(
        F.size(F.regexp_extract_all(text_col, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text_col, F.lit(_URL_RE), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all(text_col, F.lit(_PHONEISH_RE), F.lit(0))).alias("n_phoneish"),
    )


# Intra-document repetition metrics — the Gopher/RefinedWeb-style
# quality rules that catch boilerplate, scraped navigation chrome, and
# degenerate generations WITHIN one document (cross-document dedup
# can't see these).  All JVM-side array expressions over a staged
# line/token array (NOTES.md fact 3: stage the array once, then
# aggregate — HOF lambdas get no CSE).


def _lines(text_col: Column) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(text_col, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def repetition_metrics(text_col: Column) -> Column:
    """struct(dup_line_ratio, top_line_ratio, dup_2gram_ratio) — the
    within-document repetition profile:

      dup_line_ratio   1 - distinct_lines/lines — share of lines that
                       repeat an earlier line (nav chrome, boilerplate)
      top_line_ratio   occurrences of the most frequent line / lines —
                       a single spammed line dominates the doc
      dup_2gram_ratio  1 - distinct_2grams/2grams over word tokens —
                       degenerate repetition below line granularity

    All ratios in [0, 1]; 0 for docs too short to measure (no lines /
    fewer than two tokens).  Curation keeps docs under a threshold
    (RefinedWeb drops dup_line_ratio > 0.3); thresholds belong to the
    pipeline, the metric is the operator.
    """
    lines = _lines(text_col)
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))

    # top-line frequency: sort the lines, then ONE linear run-length
    # pass — the longest run of equal adjacent lines IS the max
    # occurrence count.  O(L log L) per doc vs the
    # aggregate-over-distinct x filter-scan form, which was
    # O(lines x distinct_lines) and went quadratic on pathological
    # multi-hundred-thousand-line documents (round-6 VERDICT item 2).
    # `prev` starts at "" — never a line value (_lines drops empties).
    run_state = F.aggregate(
        F.array_sort(lines),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, l: F.struct(
            l.alias("prev"),
            F.when(l == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(l == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_line = F.when(
        n_lines > 0, run_state["best"] / n_lines.cast("double")
    ).otherwise(F.lit(0.0))

    # bigrams via zip_with over two slices: the lambda sees both tokens
    # directly, so NO outer array is referenced inside it.  The previous
    # transform + element_at(toks, i+2) form re-evaluated the full
    # tokenization per element (HOF lambdas get no CSE — NOTES.md), i.e.
    # O(T) regex splits of the whole document per token: quadratic.
    toks = tokens(text_col)
    n_toks = F.size(toks)
    grams = F.when(
        n_toks >= 2,
        F.zip_with(
            F.slice(toks, 1, n_toks - 1),
            F.slice(toks, 2, n_toks - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    dup_gram = F.when(
        n_grams > 0,
        1.0 - F.size(F.array_distinct(grams)) / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))

    return F.struct(
        F.round(dup_line, 9).alias("dup_line_ratio"),
        F.round(top_line, 9).alias("top_line_ratio"),
        F.round(dup_gram, 9).alias("dup_2gram_ratio"),
    )
