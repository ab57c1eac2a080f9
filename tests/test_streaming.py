"""Structured Streaming: exactly-once triples via checkpointed file stream,
and watermarked event-time rollups."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ontology_pipeline_spark.schemas import PAGES
from ontology_pipeline_spark.streaming.stream import (
    read_page_stream,
    run_stream_once,
    windowed_mention_counts,
)
from ontology_pipeline_spark.synth import generate_corpus


def test_stream_drain_and_delta(spark, tmp_path):
    corpus = generate_corpus(n_pages=80, seed=21)
    src = str(tmp_path / "pages_stream")
    sink = str(tmp_path / "triples_sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    half1 = [p for i, p in enumerate(corpus.pages) if i % 2 == 0]
    half2 = [p for i, p in enumerate(corpus.pages) if i % 2 == 1]
    spark.createDataFrame(half1, schema=PAGES).coalesce(2).write.mode("append").parquet(src)

    run_stream_once(spark, src, sink, ckpt)
    got1 = {
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in spark.read.parquet(sink).collect()
    }
    want1 = {t for t in corpus.expected_triples if t[3] in {p[0] for p in half1}}
    assert got1 == want1

    # new files land -> second drain processes ONLY the delta (exactly-once)
    spark.createDataFrame(half2, schema=PAGES).coalesce(2).write.mode("append").parquet(src)
    run_stream_once(spark, src, sink, ckpt)
    got2 = [
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in spark.read.parquet(sink).collect()
    ]
    assert len(got2) == len(set(got2))  # no duplicates from reprocessing
    assert set(got2) == set(corpus.expected_triples)


def test_windowed_mention_counts(spark, tmp_path):
    corpus = generate_corpus(n_pages=60, seed=9)
    src = str(tmp_path / "pages_w")
    spark.createDataFrame(corpus.pages, schema=PAGES).write.parquet(src)

    out = str(tmp_path / "winsink")
    q = (
        windowed_mention_counts(read_page_stream(spark, src), window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from win_counts").collect()
    assert rows, "windowed rollup produced no rows"
    # total mentions across windows equals total mention instances in corpus
    total = sum(r["n_mentions"] for r in rows)
    batch_total = (
        __import__("ontology_pipeline_spark.operators.mentions", fromlist=["detect_mentions"])
        .detect_mentions(spark.read.parquet(src), __import__("ontology_pipeline_spark.lexicon", fromlist=["lexicon_rows"]).lexicon_rows())
        .count()
    )
    assert total == batch_total
    _ = out


def test_windowed_mention_counts_html_only_pages(spark, tmp_path):
    """Regression: html-only pages (text NULL — the WARC-dump source shape)
    must still count via the extract_text fallback, not silently report 0."""
    corpus = generate_corpus(n_pages=40, seed=33)
    html_only = [(u, ts, html, None, lang) for (u, ts, html, _t, lang) in corpus.pages]
    src = str(tmp_path / "pages_h")
    spark.createDataFrame(html_only, schema=PAGES).write.parquet(src)

    q = (
        windowed_mention_counts(read_page_stream(spark, src), window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts_h")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from win_counts_h").collect()
    total = sum(r["n_mentions"] for r in rows)
    # extract_text(html) is byte-identical to the stored text, so the
    # expected count is just mentions over the original text pages
    from ontology_pipeline_spark.lexicon import lexicon_rows
    from ontology_pipeline_spark.operators.mentions import detect_mentions

    batch_total = detect_mentions(
        spark.createDataFrame(corpus.pages, schema=PAGES), lexicon_rows()
    ).count()
    assert total == batch_total > 0


def test_deduped_page_stream_drops_recrawls(spark, tmp_path):
    """Streaming exact dedup: identical-content re-crawls are dropped within
    the watermark horizon; changed-content re-crawls pass through."""
    import datetime as dt

    from ontology_pipeline_spark.streaming.stream import deduped_page_stream

    base_ts = dt.datetime(2025, 1, 1)
    rows = [
        ("https://a.test/p1", base_ts, None, "alpha beta gamma", "en"),
        # re-crawl, same content, 1h later -> duplicate, dropped
        ("https://a.test/p1", base_ts + dt.timedelta(hours=1), None, "alpha beta gamma", "en"),
        # re-crawl with CHANGED content -> kept
        ("https://a.test/p1", base_ts + dt.timedelta(hours=2), None, "alpha beta delta", "en"),
        # different url, same content as p1 -> near-crawl mirror, dropped
        ("https://b.test/p9", base_ts + dt.timedelta(hours=3), None, "alpha beta gamma", "en"),
        ("https://c.test/p2", base_ts, None, "totally different", "en"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, schema=PAGES).write.parquet(src)

    q = (
        deduped_page_stream(read_page_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select url, text from dedup_stream").collect()
    # exactly one survivor per distinct content; WHICH duplicate survives is
    # arrival-order dependent (documented), so assert content-level facts
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha beta delta", "alpha beta gamma", "totally different"]
    gamma_urls = {r["url"] for r in out if r["text"] == "alpha beta gamma"}
    assert gamma_urls <= {"https://a.test/p1", "https://b.test/p9"}
    assert {r["url"] for r in out if r["text"] == "alpha beta delta"} == {"https://a.test/p1"}
