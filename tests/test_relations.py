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
    """MULTISET equality, not set equality — both paths must agree on
    page-local dedup, not just on which triples exist somewhere."""
    lex = lexicon_rows()
    rows = lambda df: sorted(
        (r["subj"], r["subj_class"], r["pred"], r["obj"], r["obj_class"], r["url"])
        for r in df.collect()
    )
    fused = rows(extract_triples_fused(pages, lex))
    joined = rows(score_relations(detect_mentions(pages, lex)))
    assert fused == joined


def test_join_path_equals_fused_on_repeats_and_shared_positions(spark):
    """Regression for the two historical divergences: (a) a mention repeated
    in one sentence must not double-emit in the join path (page-local dedup);
    (b) one alias mapped to two classes (same position, two mentions) must
    pair in BOTH paths, not only the fused one."""
    from ontology_pipeline_spark.lexicon import simple_lexicon

    lex = simple_lexicon(
        {"assessment": ["cmj scan"], "construct": ["leg power"]}
    ) + simple_lexicon({"intervention": ["plyo block"]})
    # same alias in two classes (same position -> two mentions whose pairing
    # is observable: assessment+construct => a "measures" triple):
    lex = lex + [("construct", "cmj scan", "cmj scan", None, None)]
    df = spark.createDataFrame(
        [
            ("u1", "cmj scan measures leg power then cmj scan again"),
            ("u2", "plyo block improves leg power"),
        ],
        ["url", "text"],
    )
    rows = lambda d: sorted(
        (r["subj"], r["subj_class"], r["pred"], r["obj"], r["obj_class"], r["url"])
        for r in d.collect()
    )
    fused = rows(extract_triples_fused(df, lex))
    joined = rows(score_relations(detect_mentions(df, lex)))
    assert fused == joined
    # repeated mention produced ONE row, not two
    assert len([t for t in fused if t[5] == "u1" and t[0] == "cmj scan"]) == len(
        {t for t in fused if t[5] == "u1" and t[0] == "cmj scan"}
    )


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
