"""Byte-identity invariant for the HTML->text stage (BASELINE.json
input_hint: byte-identical extracted text per url)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.extract_text import (
    extract_text,
    extract_text_bytes,
)


def test_pure_function_byte_identity(corpus):
    for url, _ts, html, text, _lang in corpus.pages:
        extracted = extract_text_bytes(html)
        assert extracted == text, url
        assert hashlib.sha256(extracted.encode()).hexdigest() == corpus.text_sha256[url]


def test_spark_stage_byte_identity(spark, pages, corpus):
    out = extract_text(pages.drop("text"), out_col="text").select("url", "text")
    got = {r["url"]: r["text"] for r in out.collect()}
    want = {p[0]: p[3] for p in corpus.pages}
    assert got == want


def test_boilerplate_stripped():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head><body>"
        b"<nav>Home | About</nav><script>var x=1;</script>"
        b"<article><p>Alpha beta.</p><p>Gamma &amp; delta.</p></article>"
        b"<footer>(c) 2025</footer></body></html>"
    )
    assert extract_text_bytes(html) == "Alpha beta.\nGamma & delta."


def test_null_and_garbage_html(spark):
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""
    # malformed HTML degrades, never raises (reference lenient-parse ethos,
    # src/extractor.py:120-128)
    assert isinstance(extract_text_bytes(b"<p>ok"), str)
