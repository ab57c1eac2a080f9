"""Public scalar-function surface: ontology_pipeline_spark.functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_pipeline_spark import functions as OF


def test_display_name_and_truncate(spark):
    df = spark.createDataFrame(
        [("strength_training_2024.txt", "abcdef"), ("sleep-study.html", "xy")],
        ["name", "text"],
    )
    out = df.select(
        OF.display_name("name").alias("d"), OF.truncate("text", 3).alias("t")
    ).collect()
    assert out[0]["d"] == "Strength Training 2024" and out[0]["t"] == "abc"
    assert out[1]["d"] == "Sleep Study" and out[1]["t"] == "xy"


def test_cosine_function(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"]
    )
    got = [round(r["c"], 6) for r in df.select(OF.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [0.0, 1.0]


def test_surface_is_columns(spark):
    """Every exported name builds a Column from a string/Column input."""
    df = spark.createDataFrame([("hello world. spark rocks",)], ["text"])
    cols = [
        OF.tokens(F.col("text")),
        OF.token_count(F.col("text")),
        OF.bpe_ish_token_count(F.col("text")),
        OF.type_token_ratio(F.col("text")),
        OF.stopword_ratio(F.col("text")),
        OF.punct_ratio(F.col("text")),
        OF.quality_score(F.col("text")),
        OF.lang_id(F.col("text")),
        OF.fingerprint(F.col("text")),
        OF.simhash(F.col("text")),
        OF.clean_json_expr(F.col("text")),
    ]
    row = df.select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).first()
    assert row is not None
