"""Fused HTML->triples stage must equal the two-stage (extract_text then
extract_triples_fused) composition exactly."""

from __future__ import annotations

from ontology_pipeline_spark.lexicon import lexicon_rows
from ontology_pipeline_spark.operators.extract_text import extract_text
from ontology_pipeline_spark.operators.relations import (
    extract_triples_from_html,
    extract_triples_fused,
)


def test_fused_html_equals_two_stage(spark, pages):
    lex = lexicon_rows()
    one_stage = {
        tuple(r) for r in extract_triples_from_html(pages.drop("text"), lex).collect()
    }
    two_stage = {
        tuple(r)
        for r in extract_triples_fused(
            extract_text(pages.drop("text"), out_col="text"), lex
        ).collect()
    }
    assert one_stage == two_stage and len(one_stage) > 0
