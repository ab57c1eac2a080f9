"""Public scalar/column function surface (pyspark.sql.functions style).

Every function here returns a Column expression (JVM-side, codegen-friendly)
— the engine's analog of the reference's scattered scalar helpers (SURVEY.md
§2.4).  Heavy batch transforms live in `..operators`; this module is the
composable per-column vocabulary:

    from ontology_pipeline_spark import functions as OF
    docs.select(OF.fingerprint("text"), OF.quality_score("text"))

The only pandas-UDF-backed entry is `extracted_text` (HTML parsing is not
expressible in Spark SQL); everything else is pure built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.docs import clean_json_expr
from ..operators.extract_text import extracted_text
from ..operators.similarity import _dot as dot
from ..operators.similarity import _norm as norm
from ..operators.text_analysis import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    simhash,
    stopword_ratio,
    token_count,
    tokens,
    type_token_ratio,
)

__all__ = [
    "bpe_ish_token_count",
    "clean_json_expr",
    "cosine",
    "display_name",
    "dot",
    "extracted_text",
    "fingerprint",
    "lang_id",
    "norm",
    "punct_ratio",
    "quality_score",
    "simhash",
    "stopword_ratio",
    "token_count",
    "tokens",
    "truncate",
    "type_token_ratio",
]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (JVM-side)."""
    return dot(a, b) / (norm(a) * norm(b))


def display_name(col) -> Column:
    """File/url name -> human display name: strip a trailing extension, map
    separators to spaces, title-case.  Reference semantics at
    streamlit_app.py:419 (`replace('.txt','').replace('_',' ').title()`),
    generalized to any extension and to '-' separators."""
    c = F.col(col) if isinstance(col, str) else col
    stem = F.regexp_replace(c, r"\.[A-Za-z0-9]+$", "")
    return F.initcap(F.regexp_replace(stem, r"[_\-]+", " "))


def truncate(col, n: int) -> Column:
    """First n characters (reference F9 truncation semantics,
    src/extractor.py:448: `transcript[:2000]`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)
