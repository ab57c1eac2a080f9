"""Relation scoring stage (S3) — replaces the reference's LLM relationship
pass M6 (reference src/extractor.py:690-759; 4-pass variant
src/prompts.py:224-264).

Semantics: deterministic class-pair rules over sentence-level co-occurrence,
using the reference's own edge vocabulary (edge construction at
streamlit_app.py:744-760):

    assessment   + construct     -> (assessment,  "measures",    construct)
    intervention + construct     -> (intervention, "targets",    construct)
    assessment   + intervention  -> (assessment,  "informs",     intervention)
    construct    + construct     -> (earlier,     "association", later)

Two physical strategies, same logical result (tested equal):

* `score_relations(mentions)` — a pure DataFrame self-join on
  (url, sent_id) with `pos_a < pos_b`.  Catalyst plans it; AQE skew-join
  splits the head-entity partitions.  Use when mentions arrive as a table.
* `extract_triples_fused(pages, lexicon)` — mention detection + pairing in a
  SINGLE mapInPandas pass: co-occurrence is sentence-local, so the whole
  triple extraction is shuffle-free.  This is the 100 TB hot path: one narrow
  stage from page scan to triple rows; the only shuffles left in the
  pipeline are the final aggregations.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TRIPLES
from .mentions import _compile, scan_text

# unordered class-pair -> (subject_class, predicate)
PAIR_RULES: dict[frozenset, tuple[str, str]] = {
    frozenset(["assessment", "construct"]): ("assessment", "measures"),
    frozenset(["intervention", "construct"]): ("intervention", "targets"),
    frozenset(["assessment", "intervention"]): ("assessment", "informs"),
}


def _pair_triples(ments: list[tuple]) -> list[tuple]:
    """Pure pairing over one page's mentions: [(url, sent_id, pos, surface,
    canonical, class)] -> [(subj, subj_class, pred, obj, obj_class, url)]."""
    from collections import defaultdict

    by_sent: dict[int, list] = defaultdict(list)
    for url, sent_id, pos, _surface, canonical, cls in ments:
        by_sent[sent_id].append((pos, canonical, cls, url))
    out = []
    for sent in by_sent.values():
        sent.sort()
        for i in range(len(sent)):
            for j in range(i + 1, len(sent)):
                pa, ca, cla, url = sent[i]
                pb, cb, clb, _ = sent[j]
                if ca == cb and cla == clb:
                    continue
                if cla == "construct" and clb == "construct":
                    out.append((ca, cla, "association", cb, clb, url))
                    continue
                rule = PAIR_RULES.get(frozenset([cla, clb]))
                if rule is None:
                    continue
                subj_class, pred = rule
                if cla == subj_class:
                    out.append((ca, cla, pred, cb, clb, url))
                else:
                    out.append((cb, clb, pred, ca, cla, url))
    # page-local dedup (order-preserving): the triple sink holds distinct
    # (subj, pred, obj, url) rows without needing a corpus-wide shuffle
    return list(dict.fromkeys(out))


def score_relations(mentions: DataFrame) -> DataFrame:
    """Mentions table -> triples via self-join on (url, sent_id).

    Logically identical to the fused path (tested as equal multisets): the
    pair ordering is the lexicographic struct (pos, canonical, entity_class)
    — strictly `pos_a < pos_b` would DROP distinct mentions sharing a
    position (one alias in two classes) that the fused i<j loop pairs — and
    the output is page-local-deduped (`distinct()`, url is a column, so
    distinct == the fused path's per-page dict.fromkeys).

    The join keys (url, sent_id) are high-cardinality, so the shuffle is well
    spread; head-entity skew lives in the *values*, not the keys, and the
    downstream distinct/groupBy is where AQE skew handling applies.
    """
    a = mentions.alias("a")
    b = mentions.alias("b")
    order = lambda side: F.struct(
        F.col(f"{side}.pos"), F.col(f"{side}.canonical"), F.col(f"{side}.entity_class")
    )
    pairs = a.join(
        b,
        on=[
            F.col("a.url") == F.col("b.url"),
            F.col("a.sent_id") == F.col("b.sent_id"),
            order("a") < order("b"),
        ],
    ).filter(
        ~(
            (F.col("a.canonical") == F.col("b.canonical"))
            & (F.col("a.entity_class") == F.col("b.entity_class"))
        )
    )

    ca, cb = F.col("a.entity_class"), F.col("b.entity_class")
    na, nb = F.col("a.canonical"), F.col("b.canonical")

    both_constructs = (ca == "construct") & (cb == "construct")

    def rule(cls1: str, cls2: str) -> F.Column:
        return ((ca == cls1) & (cb == cls2)) | ((ca == cls2) & (cb == cls1))

    a_is_subj = F.when(both_constructs, F.lit(True)).otherwise(
        F.when(rule("assessment", "construct"), ca == "assessment")
        .when(rule("intervention", "construct"), ca == "intervention")
        .when(rule("assessment", "intervention"), ca == "assessment")
    )
    pred = (
        F.when(both_constructs, F.lit("association"))
        .when(rule("assessment", "construct"), F.lit("measures"))
        .when(rule("intervention", "construct"), F.lit("targets"))
        .when(rule("assessment", "intervention"), F.lit("informs"))
    )
    return (
        pairs.select(
            F.when(a_is_subj, na).otherwise(nb).alias("subj"),
            F.when(a_is_subj, ca).otherwise(cb).alias("subj_class"),
            pred.alias("pred"),
            F.when(a_is_subj, nb).otherwise(na).alias("obj"),
            F.when(a_is_subj, cb).otherwise(ca).alias("obj_class"),
            F.col("a.url").alias("url"),
        )
        .filter(F.col("pred").isNotNull())
        .distinct()
    )


def _fused_triples_stage(
    pages: DataFrame,
    lexicon_rows: list[tuple],
    value_col: str,
    id_col: str,
    to_text,
) -> DataFrame:
    """Shared mapInPandas body for both fused variants: one implementation,
    parameterized by a per-row text accessor, so pairing/schema/batching can
    never drift between the text and html entry points."""
    lex = tuple(tuple(r) for r in lexicon_rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern, lookup = _compile(lex)
        cols = ["subj", "subj_class", "pred", "obj", "obj_class", "url"]
        for pdf in batches:
            rows: list[tuple] = []
            for url, val in zip(pdf[id_col], pdf[value_col]):
                rows.extend(
                    _pair_triples(scan_text(url, to_text(val), pattern, lookup))
                )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select(id_col, value_col).mapInPandas(run, schema=TRIPLES)


def extract_triples_fused(
    pages: DataFrame,
    lexicon_rows: list[tuple],
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """pages -> triples in one shuffle-free mapInPandas stage (the hot path)."""
    return _fused_triples_stage(pages, lexicon_rows, text_col, id_col, lambda t: t)


def extract_triples_from_html(
    pages: DataFrame,
    lexicon_rows: list[tuple],
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """pages(html) -> triples in ONE Python stage: HTML->text (same pure
    function as the extract_text stage, so the byte-identity invariant is
    preserved) + mention scan + pairing, all inside a single mapInPandas.

    One Arrow round-trip instead of two (pandas-UDF text extraction followed
    by a second mapInPandas) — at 100 TB this halves the JVM<->Python worker
    transfer on the hot path and keeps the whole extraction narrow.
    """
    from .extract_text import extract_text_bytes

    return _fused_triples_stage(
        pages, lexicon_rows, html_col, id_col, extract_text_bytes
    )


def distinct_triples(triples: DataFrame, with_url_list: bool = False) -> DataFrame:
    """Corpus-level distinct (subj, pred, obj) with provenance counts.

    Skew note: head entities ("Sleep Quality"-class nodes) concentrate a huge
    fraction of rows on a few group keys.  countDistinct partial-aggregates
    map-side, so the skewed key ships pre-combined counts, not url strings;
    the full provenance list (`with_url_list=True`, reference `files` lists at
    streamlit_app.py:103) is only materialized for small corpora — at web
    scale provenance stays as rows in the triple table.
    """
    aggs = [
        F.countDistinct("url").alias("n_pages"),
        F.min("url").alias("first_url"),
    ]
    if with_url_list:
        aggs.append(F.sort_array(F.collect_set("url")).alias("urls"))
    return triples.groupBy("subj", "subj_class", "pred", "obj", "obj_class").agg(*aggs)
