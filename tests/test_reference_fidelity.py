"""Fidelity vs the reference's shipped fixture output.

Feeds the reference's own corpus-level result document
(/root/reference/data/outputs/extraction_results.json — 19 files, the
artifact BASELINE.md's entity/edge totals are counted from) through this
engine's document operators and asserts the Spark results equal a pure-Python
traversal implementing the reference's exact dict semantics
(extract_all_entities at streamlit_app.py:75-181 and the render_network_graph
edge loops at streamlit_app.py:744-760).

Skipped when the reference tree is not present (the repo stays standalone).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.docs import (
    aggregate_entities,
    corpus_summary,
    edges_from_docs,
)
from ontology_pipeline_spark.schemas import EXTRACTION_DOC

REF = "/root/reference/data/outputs/extraction_results.json"

pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference fixtures not present")


def _proj(item: dict, fields: list[str]) -> dict:
    return {k: item.get(k) for k in fields}


def _load_docs() -> list[dict]:
    data = json.load(open(REF))
    docs = []
    for f in data["processed_files"]:
        if "error" in f:
            docs.append({"url": f.get("file_name", "?"), "error": str(f["error"])})
            continue
        dc = f.get("domains_constructs", {}) or {}
        tm = (f.get("ontology_guided_data", {}) or {}).get("technologies_metrics", {}) or {}
        rel = f.get("relationships", {}) or {}

        def arr(items, fields):
            out = [_proj(x, fields) for x in (items or []) if isinstance(x, dict)]
            return out or None

        docs.append(
            {
                "url": f["file_name"],
                "text_length": f.get("transcript_length"),
                "constructs_identified": f.get("constructs_identified"),
                "domains": arr(dc.get("practitioner_domains"), ["domain_name", "domain_description", "specialization_notes"]),
                "constructs": arr(dc.get("constructs_mentioned"), ["construct_name", "construct_description", "domain_association", "assessment_context"]),
                "assessments": arr((f.get("assessments", {}) or {}).get("assessments"), ["assessment_name", "assessment_description", "modality", "constructs_measured"]),
                "interventions": arr((f.get("interventions", {}) or {}).get("interventions"), ["intervention_name", "intervention_description", "purpose", "constructs_targeted", "intervention_types"]),
                "technologies": arr(tm.get("technologies"), ["technology_name", "vendor_manufacturer", "technology_type", "specific_model", "used_for_assessments"]),
                "metrics": arr(tm.get("metrics"), ["metric_name", "measurement_unit", "assessment_source", "normal_ranges", "interpretation_notes"]),
                "relationships": {
                    "construct_relationships": arr(rel.get("construct_relationships"), ["source_construct", "target_construct", "relationship_type", "relationship_description", "directionality"]),
                    "assessment_construct_links": arr(rel.get("assessment_construct_links"), ["assessment_name", "constructs_measured", "measurement_relationship"]),
                    "intervention_construct_links": arr(rel.get("intervention_construct_links"), ["intervention_name", "constructs_targeted", "mechanism_of_action"]),
                    "assessment_intervention_connections": arr(rel.get("assessment_intervention_connections"), ["assessment_name", "intervention_name", "connection_type", "connection_description"]),
                },
                "error": None,
            }
        )
    return docs


# pure-Python goldens with the reference's exact dict semantics -------------

_CLASS_SPECS = [
    ("domains", "domain_name"),
    ("constructs", "construct_name"),
    ("assessments", "assessment_name"),
    ("interventions", "intervention_name"),
    ("technologies", "technology_name"),
    ("metrics", "metric_name"),
]


def _golden_entities(docs):
    out = {cls: {} for cls, _ in _CLASS_SPECS}
    for d in docs:
        if d.get("error"):
            continue
        for cls, key in _CLASS_SPECS:
            for item in d.get(cls) or []:
                name = item.get(key) or ""
                if not name:
                    continue
                out[cls].setdefault(name, []).append(d["url"])
    return out


def _golden_edges(docs):
    edges = []
    for d in docs:
        if d.get("error"):
            continue
        rel = d.get("relationships") or {}
        for r in rel.get("construct_relationships") or []:
            edges.append((r["source_construct"], r.get("relationship_type", ""), r["target_construct"], d["url"]))
        for r in rel.get("assessment_construct_links") or []:
            for c in r.get("constructs_measured") or []:
                edges.append((r["assessment_name"], r.get("measurement_relationship") or "measures", c, d["url"]))
        for r in rel.get("intervention_construct_links") or []:
            for c in r.get("constructs_targeted") or []:
                edges.append((r["intervention_name"], "targets", c, d["url"]))
        for r in rel.get("assessment_intervention_connections") or []:
            edges.append((r["assessment_name"], r.get("connection_type") or "informs", r["intervention_name"], d["url"]))
    return edges


@pytest.fixture(scope="module")
def ref_docs_df(spark):
    return spark.createDataFrame(_load_docs(), schema=EXTRACTION_DOC).cache()


def test_entity_aggregation_matches_reference_semantics(spark, ref_docs_df):
    docs = _load_docs()
    golden = _golden_entities(docs)
    for cls, key in _CLASS_SPECS:
        agg = aggregate_entities(ref_docs_df, cls, key, attrs=[])
        got = {r["name"]: set(r["files"]) for r in agg.collect()}
        want = {n: set(files) for n, files in golden[cls].items()}
        assert got == want, cls


def test_edge_construction_matches_reference_semantics(spark, ref_docs_df):
    golden = _golden_edges(_load_docs())
    got = [
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in edges_from_docs(ref_docs_df).collect()
    ]
    assert sorted(got) == sorted(golden)
    # corpus totals from the shipped fixture (SURVEY.md §6):
    # 116 construct-construct + 129 assessment-intervention edges
    preds = edges_from_docs(ref_docs_df)
    assert preds.filter((F.col("subj_class") == "construct") & (F.col("obj_class") == "construct")).count() == 116
    assert preds.filter((F.col("subj_class") == "assessment") & (F.col("obj_class") == "intervention")).count() == 129


def test_corpus_summary(spark, ref_docs_df):
    row = corpus_summary(ref_docs_df).collect()[0]
    assert row["total_files"] == 19
    assert row["successful"] == 19
    assert row["failed"] == 0
