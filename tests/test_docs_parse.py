"""Lenient JSON document parsing (reference safe_json_parse +
clean_response_text, src/extractor.py:120-155) and last-wins upsert
(merge_results, src/extractor.py:76-104)."""

from __future__ import annotations

from ontology_pipeline_spark.operators.docs import parse_extraction_docs, upsert_last_wins


def test_parse_handles_fences_prefix_and_garbage(spark):
    rows = [
        ("u1", '{"constructs_identified": 2, "text_length": 10}'),
        ("u2", 'Here is the JSON:\n```json\n{"constructs_identified": 3}\n```'),
        ("u3", "not json at all"),
        ("u4", '{"broken": '),
    ]
    df = spark.createDataFrame(rows, ["url", "raw_json"])
    out = {r["url"]: r for r in parse_extraction_docs(df).collect()}
    assert out["u1"]["constructs_identified"] == 2 and out["u1"]["error"] is None
    assert out["u2"]["constructs_identified"] == 3 and out["u2"]["error"] is None
    assert out["u3"]["error"] == "JSON parsing failed"
    assert out["u4"]["error"] == "JSON parsing failed"


def test_upsert_last_wins(spark):
    old = spark.createDataFrame([("u1", 1, "old"), ("u2", 1, "keep")], ["url", "run", "val"])
    new = spark.createDataFrame([("u1", 2, "new")], ["url", "run", "val"])
    out = {r["url"]: r["val"] for r in upsert_last_wins(old, new, "url", "run").collect()}
    assert out == {"u1": "new", "u2": "keep"}


def test_upsert_tie_new_side_wins(spark):
    """Regression: on an order_col tie the NEW row must win (reference
    merge_results overwrites unconditionally), not an arbitrary one."""
    from ontology_pipeline_spark.operators.docs import upsert_last_wins

    existing = spark.createDataFrame([("k1", 5, "old")], ["url", "ver", "val"])
    new = spark.createDataFrame([("k1", 5, "new")], ["url", "ver", "val"])
    out = upsert_last_wins(existing, new, key="url", order_col="ver").collect()
    assert len(out) == 1 and out[0]["val"] == "new"


def test_coverage_report_missed_entities(spark):
    """M8 missed-entity half: unmentioned lexicon canonicals are listed
    per class, sorted and '|'-joined; fully-covered classes report an
    empty string and ratio 1.0."""
    from ontology_pipeline_spark.operators.docs import coverage_report

    lex = [
        ("construct", "Sleep Quality", "Sleep Quality", None, None),
        ("construct", "Fall Risk", "Fall Risk", None, None),
        ("construct", "Aerobic Capacity", "Aerobic Capacity", None, None),
        ("assessment", "DEXA Scan", "DEXA Scan", None, None),
    ]
    mentions = spark.createDataFrame(
        [
            ("u1", "Sleep Quality", "construct"),
            ("u2", "Sleep Quality", "construct"),
            ("u2", "DEXA Scan", "assessment"),
        ],
        ["url", "canonical", "entity_class"],
    )
    got = {r["entity_class"]: r for r in coverage_report(mentions, lex).collect()}
    c = got["construct"]
    assert (c["n_lexicon"], c["n_mentioned"]) == (3, 1)
    assert abs(c["coverage_ratio"] - round(1 / 3, 6)) < 1e-9
    assert c["missed_entities"] == "Aerobic Capacity|Fall Risk"
    a = got["assessment"]
    assert (a["n_lexicon"], a["n_mentioned"], a["coverage_ratio"]) == (1, 1, 1.0)
    assert a["missed_entities"] == ""
