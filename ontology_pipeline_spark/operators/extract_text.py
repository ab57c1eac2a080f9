"""HTML -> text extraction stage (S1).

Replaces the reference's whole-file transcript read (reference
src/extractor.py:206-207, :481-482, :822-823) for Common-Crawl-style pages:
a trafilatura-style main-content extractor that strips boilerplate
(nav/header/footer/aside/script/style) and keeps paragraph text.

The extractor is a PURE function (`extract_text_bytes`) with pinned
normalization (entity decoding, paragraph join by "\\n", per-paragraph
whitespace strip) so the per-row invariant holds: byte-identical extracted
text per url across runs and parallelism levels (BASELINE.json input_hint).

Execution is an Arrow-batched pandas UDF — the Python work arrives in
columnar batches, never row-at-a-time; at cluster scale this stage is
embarrassingly parallel (narrow, no shuffle).
"""

from __future__ import annotations

import html.parser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SKIP_TAGS = {"script", "style", "nav", "header", "footer", "aside", "noscript", "head", "title"}
_BLOCK_TAGS = {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "br", "article", "section"}


class _MainTextParser(html.parser.HTMLParser):
    """Collect block-level text outside boilerplate containers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []
        self._current: list[str] = []

    def _flush(self) -> None:
        txt = "".join(self._current).strip()
        self._current = []
        if txt:
            self._parts.append(txt)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._current.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._parts)


def extract_text_bytes(html_bytes: bytes | None) -> str | None:
    """Pure, deterministic HTML -> text. The byte-identity unit of the engine."""
    if html_bytes is None:
        return None
    try:
        raw = html_bytes.decode("utf-8", errors="replace")
    except Exception:
        return None
    parser = _MainTextParser()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        return None
    return parser.result()


@pandas_udf(StringType())
def _extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_bytes)


def extracted_text(html_col: Column) -> Column:
    """Column expression: extracted main text from an HTML binary column."""
    return _extract_text_udf(html_col)


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Add/replace the extracted-text column on a pages DataFrame."""
    return pages.withColumn(out_col, extracted_text(F.col(html_col)))
