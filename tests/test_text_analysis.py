"""Text-analysis operators: deterministic values on hand-computable inputs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.text_analysis import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    profile,
    quality_score,
    simhash,
    token_count,
    type_token_ratio,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c\nd", token_count(F.col("text"))) == 4
    assert _one(spark, "", token_count(F.col("text"))) == 0


def test_bpe_ish_token_count(spark):
    # "don't stop!" -> don | ' | t | stop | !
    assert _one(spark, "don't stop!", bpe_ish_token_count(F.col("text"))) == 5


def test_type_token_ratio(spark):
    assert _one(spark, "a b a b", type_token_ratio(F.col("text"))) == 0.5


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog in that house", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh", lang_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, "  Hello   World ", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    assert a == b == hashlib.md5(b"hello world").hexdigest()


def test_simhash_similar_texts_close(spark):
    h1 = _one(spark, "the quick brown fox jumps over the lazy dog", simhash(F.col("text")))
    h2 = _one(spark, "the quick brown fox jumps over the lazy cat", simhash(F.col("text")))
    h3 = _one(spark, "completely unrelated words entirely different topic", simhash(F.col("text")))
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13
    assert _one(spark, "", simhash(F.col("text"))) == 0


def test_quality_monotonic_in_diversity(spark):
    rich = _one(spark, "many different words create diverse documents here", quality_score(F.col("text")))
    poor = _one(spark, "spam spam spam spam spam spam spam spam", quality_score(F.col("text")))
    assert rich > poor


def test_profile_runs_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = profile(docs)
    assert out.count() == 50
    assert {"n_tokens", "ttr", "quality", "lang_pred", "fp"} <= set(out.columns)


def test_repetition_signals_and_structural_flags(spark):
    from ontology_pipeline_spark.operators.text_analysis import (
        dup_line_fraction,
        dup_token_fraction,
        structural_flags,
    )

    prose = (
        "The measured documents cover several distinct health constructs.\n"
        "Every page contributes new sentences with varied vocabulary today.\n"
        "Assessment results inform the next training block cleanly."
    )
    boiler = "\n".join(["Home | About | Contact"] * 8 + ["One real line here."])
    symbols = "{{{### }}} <<>> |||| ^^ ~~ [[[]]] {#} " * 5
    # brackets ALONE must trip the gate ('[' unescaped inside a Java char
    # class opens a nested class, silently dropping brackets from the
    # count): distinct tokens, one line — only sym_ratio can fail this row
    brackets = " ".join(f"[w{i}]" for i in range(30))
    df = spark.createDataFrame(
        [(1, prose), (2, boiler), (3, symbols), (4, ""), (5, brackets)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_line_fraction(F.col("text")).alias("dl"),
            dup_token_fraction(F.col("text")).alias("dt"),
            structural_flags(F.col("text")).alias("ok"),
        ).collect()
    }
    assert out[1]["dl"] == 0.0 and out[1]["ok"] is True
    assert out[2]["dl"] > 0.7 and out[2]["ok"] is False   # repeated nav rows
    assert out[3]["ok"] is False                          # symbol soup
    assert out[4]["ok"] is False and out[4]["dl"] == 0.0  # empty doc fails gate
    assert out[5]["ok"] is False                          # bracket-heavy markup
    # pure expressions: no Python stage in the plan
    plan = (
        df.select(structural_flags(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
