"""Web-text cleaning for training-data curation: PII redaction and
C4-style line filtering.

Standard components of public web-corpus pipelines (C4 / RefinedWeb shape:
line-level structural filters, pattern-based redaction) that the reference
does not need (its inputs are curated transcripts) but any 100 TB
Common-Crawl ingest does.  Everything here is built-in Column expressions —
`regexp_replace`, `split`/`filter`/`array_join` — so the whole stage stays
inside whole-stage codegen: no Python, no shuffle, linear in input
partitions.

RE2-safe patterns only (no lookaround): they run identically under Spark's
Java regex and would port to RE2-based engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) chains, applied in order.  Order matters: emails
# before bare digit runs (an email's digits must not be half-masked first).
# Phone patterns are PRECISION-FIRST: each requires an unambiguous phone
# shape (leading +CC, parenthesized area code, or 3-3-4 dashed/dotted
# groups), because a recall-first pattern mass-corrupts benign numeric
# prose — dates (2019-08-17 is 4-2-2), grouped thousands (1 000 000) and
# score rows must survive a cleaning stage that runs on every document.
PII_PATTERNS: list[tuple[str, str]] = [
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # IPv4 (word-bounded; \b is RE2-safe)
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    # phones, three unambiguous shapes:
    # +CC [sep] (area) [sep] group [sep] group
    (r"\+\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{2,4}\b", "[PHONE]"),
    # (area) group-group
    (r"\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}\b", "[PHONE]"),
    # 3-3-4 dashed/dotted (dates are 4-2-2 or 2-2-4 and never match)
    (r"\b\d{3}[.-]\d{3}[.-]\d{4}\b", "[PHONE]"),
    # long digit runs (account/card numbers); 9+ so years/zip codes survive
    (r"\b\d{9,}\b", "[NUMBER]"),
]


def redact_pii(text: Column, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Chain of `regexp_replace` masks over a text column (JVM-side).
    `patterns=[]` is an explicit no-op (only None selects the defaults)."""
    out = text
    for pat, repl in patterns if patterns is not None else PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_documents(
    documents: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """documents with `text_col` PII-redacted (in place by default)."""
    return documents.withColumn(out_col or text_col, redact_pii(F.col(text_col)))


def c4_line_filter(
    text: Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_patterns: tuple[str, ...] = (
        r"(?i)javascript",
        r"(?i)cookie(s)? (policy|settings|consent)",
        r"(?i)all rights reserved",
        r"(?i)terms (of (use|service))",
        r"(?i)privacy policy",
        r"\{",  # lorem-brace / code-ish lines
    ),
) -> Column:
    """C4-style structural line filter as ONE expression tree: split into
    lines, keep lines with >= min_words words that end in terminal
    punctuation and match no drop pattern, re-join.  A page reduced to
    nothing yields the empty string (callers gate on length downstream)."""
    from .text_analysis import tokens

    lines = F.split(text, r"\n")
    # one tokenization definition pipeline-wide: reuse text_analysis.tokens
    # so the min-words gate can never diverge from token_count/quality
    word_count = lambda l: F.size(tokens(F.trim(l)))
    keep = lambda l: (
        (word_count(l) >= F.lit(min_words))
        & (
            F.lit(not require_terminal_punct)
            | F.trim(l).rlike("[.!?\"']$")
        )
        & ~F.array_contains(
            F.array(*[l.rlike(p) for p in drop_patterns]), F.lit(True)
        )
    )
    return F.array_join(F.filter(lines, keep), "\n")


def clean_documents(
    documents: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    redact: bool = True,
) -> DataFrame:
    """Line-filter then (optionally) PII-redact `text_col` in place — the
    text-cleaning stage a Common-Crawl ingest runs BEFORE the curation
    chain's language/quality/dedup gates (plans/curate.py).  One narrow
    projection; composes with `curate_documents` without adding a shuffle."""
    cleaned = c4_line_filter(F.col(text_col), min_words=min_words)
    if redact:
        cleaned = redact_pii(cleaned)
    return documents.withColumn(text_col, cleaned)
