"""Protocol/dosage detail extraction — the protocols pass (M7).

Reference semantics: pass 7 extracts `assessment_protocols`,
`intervention_protocols` and dosage specifications (sets/reps/frequency/
duration/intensity) from each transcript given the assessments and
interventions found so far (reference src/extractor.py:761-810; dosage
struct :790-794).  Here the LLM prompt becomes a deterministic dosage-pattern
rule table evaluated with JVM expressions only:

    pages -> sentences -> per-pattern regexp_extract_all over the lowercased
    sentence -> one row per extracted detail -> optional join with same-
    sentence assessment/intervention mentions to attach the protocol subject.

Patterns are RE2-compatible (no lookarounds) so external engines (DuckDB
oracle, code review) can replay them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cues import sentences
from .mentions import detect_mentions

# (kind, RE2-safe pattern over the lowercased sentence); group 0 is emitted
PROTOCOL_PATTERNS: list[tuple[str, str]] = [
    ("sets_reps", r"\b\d+ sets? (?:of|x) \d+(?: reps?)?\b"),
    ("frequency", r"\b\d+ (?:times|sessions?) (?:per|a) (?:week|day|month)\b"),
    ("duration", r"\b\d+[- ](?:week|day|month|minute|hour)s?\b"),
    ("intensity", r"\b\d+% (?:of )?(?:1rm|max|hrmax|effort)\b"),
]


def extract_protocol_details(
    pages: DataFrame,
    patterns: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """One row per dosage detail found: (url, sent_id, kind, detail,
    sentence).  `detail` is the exact matched substring of the lowercased
    sentence; a sentence can emit many rows (all matches of all kinds)."""
    patterns = PROTOCOL_PATTERNS if patterns is None else patterns
    sents = sentences(pages, text_col, id_col)
    low = F.lower(F.col("sentence"))
    matches = F.flatten(
        F.array(
            *[
                F.transform(
                    F.regexp_extract_all(low, F.lit(pat), 0),
                    lambda m: F.struct(F.lit(kind).alias("kind"), m.alias("detail")),
                )
                for kind, pat in patterns
            ]
        )
    )
    return sents.select(
        "url", "sent_id", F.explode(matches).alias("m"), "sentence"
    ).select("url", "sent_id", "m.kind", "m.detail", "sentence")


def extract_protocols(
    pages: DataFrame,
    lexicon_rows: list[tuple],
    patterns: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "url",
    mentions: DataFrame | None = None,
) -> DataFrame:
    """M7 with subjects: dosage details grouped per sentence, with the
    assessments/interventions mentioned in the same sentence attached (the
    reference feeds the pass its assessment/intervention lists for exactly
    this association, src/extractor.py:767-768).

    Pass `mentions` (the S2 output, ideally persisted) to reuse the
    pipeline's existing scan instead of re-running mention detection over
    the full corpus."""
    details = extract_protocol_details(pages, patterns, text_col, id_col)
    if mentions is None:
        mentions = detect_mentions(pages, lexicon_rows, text_col=text_col, id_col=id_col)
    ments = (
        mentions.filter(F.col("entity_class").isin("assessment", "intervention"))
        .select("url", "sent_id", "canonical", "entity_class")
        .distinct()
    )
    return (
        details.join(ments, ["url", "sent_id"], "left")
        .groupBy("url", "sent_id", "kind", "detail", "sentence")
        .agg(
            F.array_sort(
                F.filter(
                    F.collect_set(
                        F.when(
                            F.col("entity_class") == "assessment", F.col("canonical")
                        )
                    ),
                    lambda c: c.isNotNull(),
                )
            ).alias("assessments"),
            F.array_sort(
                F.filter(
                    F.collect_set(
                        F.when(
                            F.col("entity_class") == "intervention", F.col("canonical")
                        )
                    ),
                    lambda c: c.isNotNull(),
                )
            ).alias("interventions"),
        )
    )
