"""Relation scoring: fused hot path vs DataFrame-join path vs golden set."""

from __future__ import annotations

from ontology_pipeline_spark.lexicon import lexicon_rows
from ontology_pipeline_spark.operators.mentions import detect_mentions
from ontology_pipeline_spark.operators.relations import (
    extract_triples_fused,
    score_relations,
)


def _key_set(rows):
    return {(r["subj"], r["pred"], r["obj"], r["url"]) for r in rows}


def test_fused_triples_match_golden(spark, pages, corpus):
    got = _key_set(extract_triples_fused(pages, lexicon_rows()).collect())
    want = set(corpus.expected_triples)
    assert got == want


def test_join_path_equals_fused_path(spark, pages):
    lex = lexicon_rows()
    fused = _key_set(extract_triples_fused(pages, lex).collect())
    joined = _key_set(score_relations(detect_mentions(pages, lex)).collect())
    assert fused == joined


def test_rule_directions(spark):
    lex = lexicon_rows()
    df = spark.createDataFrame(
        [
            ("u1", "Light Therapy targets Sleep Quality."),
            ("u2", "I assess Aerobic Capacity using the VO2 Max Test."),
            ("u3", "The Sleep Study informs Sleep Restriction Therapy."),
            ("u4", "Sleep Quality is associated with Heart Rate Variability."),
        ],
        ["url", "text"],
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in extract_triples_fused(df, lex).collect()
    }
    assert got == {
        ("Light Therapy", "targets", "Sleep Quality"),
        ("VO2 Max Test", "measures", "Aerobic Capacity"),
        ("Sleep Study", "informs", "Sleep Restriction Therapy"),
        ("Sleep Quality", "association", "Heart Rate Variability"),
    }


def test_no_cross_sentence_pairs(spark):
    df = spark.createDataFrame(
        [("u1", "Light Therapy is popular.\nSleep Quality matters.")], ["url", "text"]
    )
    assert extract_triples_fused(df, lexicon_rows()).count() == 0
