"""M7 protocols/dosage pass (reference src/extractor.py:761-810)."""

from __future__ import annotations

from ontology_pipeline_spark.lexicon import lexicon_rows
from ontology_pipeline_spark.operators.protocols import (
    extract_protocol_details,
    extract_protocols,
)

PAGES = [
    (
        "p1",
        "The 12-week Progressive Resistance Training program uses 3 sets of 8 reps at 75% of 1rm.\n"
        "Clients complete 3 sessions per week.",
    ),
    ("p2", "A VO2 Max Test lasts 20 minutes.\nNo dosage details here."),
]


def _pages(spark):
    return spark.createDataFrame(PAGES, ["url", "text"])


def test_protocol_details(spark):
    got = {
        (r["url"], r["sent_id"], r["kind"], r["detail"])
        for r in extract_protocol_details(_pages(spark)).collect()
    }
    assert got == {
        ("p1", 0, "sets_reps", "3 sets of 8 reps"),
        ("p1", 0, "duration", "12-week"),
        ("p1", 0, "intensity", "75% of 1rm"),
        ("p1", 1, "frequency", "3 sessions per week"),
        ("p2", 0, "duration", "20 minutes"),
    }


def test_protocols_attach_subjects(spark):
    out = extract_protocols(_pages(spark), lexicon_rows()).collect()
    by_key = {(r["url"], r["sent_id"], r["kind"]): r for r in out}
    r = by_key[("p1", 0, "sets_reps")]
    assert list(r["interventions"]) == ["12-week Progressive Resistance Training"]
    assert list(r["assessments"]) == []
    r2 = by_key[("p2", 0, "duration")]
    assert list(r2["assessments"]) == ["VO2 Max Test"]
