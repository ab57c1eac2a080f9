"""Web-text cleaning: PII redaction + C4-style line filtering (JVM-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.clean import (
    c4_line_filter,
    clean_documents,
    redact_documents,
    redact_pii,
)


def _one(spark, text, col_expr):
    return spark.createDataFrame([(text,)], ["text"]).select(col_expr.alias("out")).first()["out"]


def test_redact_pii_masks_each_class(spark):
    text = (
        "Contact john.doe+spam@example.co.uk or call +1 (555) 123-4567. "
        "Server at 192.168.10.25, account 12345678901 is overdue; "
        "founded in 2019 with zip 90210."
    )
    out = _one(spark, text, redact_pii(F.col("text")))
    assert "[EMAIL]" in out and "example.co.uk" not in out
    assert "[PHONE]" in out and "555" not in out
    assert "[IP]" in out and "192.168" not in out
    assert "[NUMBER]" in out and "12345678901" not in out
    # short benign numbers survive
    assert "2019" in out and "90210" in out


def test_redact_order_email_before_digits(spark):
    out = _one(spark, "mail 123456789@qq.com now", redact_pii(F.col("text")))
    assert out == "mail [EMAIL] now"  # not half-masked to [NUMBER]@qq.com


def test_redact_precision_benign_numeric_prose_survives(spark):
    """Round-3 review regression: the phone mask must be precision-first —
    dates, grouped thousands and score rows are NOT phones, and the mask
    must never swallow adjacent spaces/punctuation."""
    text = (
        "Updated 2019-08-17. Released 17.08.2019 at cost 1 000 000 dollars; "
        "scores were 10 20 30 yesterday. Call 555-123-4567 or (212) 555-0101 "
        "or +44 20 7946 0958 today."
    )
    out = _one(spark, text, redact_pii(F.col("text")))
    assert "2019-08-17" in out and "17.08.2019" in out
    assert "1 000 000 dollars" in out
    assert "scores were 10 20 30 yesterday." in out
    assert "555-123-4567" not in out and "(212) 555-0101" not in out
    assert "7946" not in out  # +CC-form phone masked
    assert "[PHONE] or [PHONE] or [PHONE] today." in out  # no glued words


def test_redact_empty_patterns_is_noop(spark):
    """patterns=[] means 'no masks', not 'the defaults' (falsy-list trap)."""
    out = _one(spark, "mail a@b.io now", redact_pii(F.col("text"), patterns=[]))
    assert out == "mail a@b.io now"


def test_c4_line_filter_structural(spark):
    text = "\n".join(
        [
            "This is a real sentence that survives the filter.",
            "Home | About | Contact",                       # no terminal punct
            "ok.",                                           # < 3 words
            "Please accept our cookies policy today.",       # drop pattern
            "All rights reserved.",                          # drop pattern
            "Another good line stays here!",
        ]
    )
    out = _one(spark, text, c4_line_filter(F.col("text")))
    assert out == (
        "This is a real sentence that survives the filter.\n"
        "Another good line stays here!"
    )


def test_clean_documents_composes_and_stays_jvm(spark):
    docs = spark.createDataFrame(
        [
            (1, "Write to a@b.io for help today.\nHome | About"),
            (2, "Nothing useful {"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in clean_documents(docs).collect()}
    assert out[1] == "Write to [EMAIL] for help today."
    assert out[2] == ""  # fully filtered page -> empty string, not NULL
    # whole stage is Column expressions: no Python eval in the plan
    plan = clean_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_redact_documents_in_place_and_out_col(spark):
    docs = spark.createDataFrame([(1, "mail a@b.io.")], ["doc_id", "text"])
    assert redact_documents(docs).first()["text"] == "mail [EMAIL]."
    r = redact_documents(docs, out_col="clean_text").first()
    assert r["text"] == "mail a@b.io." and r["clean_text"] == "mail [EMAIL]."
