"""Document-model operators: the reference's per-file nested extraction
document as a DataFrame, plus the analytics-layer normalization.

These reproduce, as Spark ops, exactly what the reference's query layer does
in Python dicts:

* `parse_extraction_docs` — lenient JSON -> EXTRACTION_DOC struct with a
  corrupt-record error column (reference safe_json_parse + clean_response_text,
  src/extractor.py:120-155: markdown-fence stripping, first-{ to last-}
  slicing, error object instead of crash).
* `aggregate_entities` — the six entity classes keyed by canonical name with
  first-writer-wins attributes and per-entity file provenance (reference
  extract_all_entities, streamlit_app.py:75-181).
* `edges_from_docs` — the four relationship lists exploded into typed,
  labeled edges (reference render_network_graph loops,
  streamlit_app.py:744-760).
* `upsert_last_wins` — merge-by-key with new rows overwriting old (reference
  merge_results, src/extractor.py:76-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import EXTRACTION_DOC


def clean_json_expr(col):
    """Response cleaning as pure expressions (reference clean_response_text,
    src/extractor.py:130-155): strip whitespace and markdown fences, slice
    from first '{' to last '}'."""
    c = F.trim(col)
    c = F.regexp_replace(c, r"^```(?:json)?\s*", "")
    c = F.regexp_replace(c, r"\s*```$", "")
    start = F.instr(c, "{")
    # last '}' via reversed instr
    rev_pos = F.instr(F.reverse(c), "}")
    end = F.length(c) - rev_pos + 1
    return F.when(
        (start > 0) & (rev_pos > 0) & (end >= start),
        F.substring(c, start, end - start + 1),
    )


def parse_extraction_docs(raw: DataFrame, json_col: str = "raw_json", url_col: str = "url") -> DataFrame:
    """Lenient parse of raw JSON documents into EXTRACTION_DOC rows.

    Unparseable rows become error-variant rows (error = 'JSON parsing failed',
    matching the reference's error object at src/extractor.py:125-128) rather
    than failing the job.
    """
    parsed = raw.select(
        F.col(url_col).alias("url"),
        F.from_json(clean_json_expr(F.col(json_col)), EXTRACTION_DOC).alias("doc"),
    )
    fields = [f.name for f in EXTRACTION_DOC.fields if f.name not in ("url", "error")]
    return parsed.select(
        "url",
        *[F.col(f"doc.{n}").alias(n) for n in fields],
        F.coalesce(
            F.col("doc.error"),
            F.when(F.col("doc").isNull(), F.lit("JSON parsing failed")),
        ).alias("error"),
    )


def aggregate_entities(docs: DataFrame, entity_field: str, name_key: str, attrs: list[str]) -> DataFrame:
    """Group one entity-class array column by canonical name.

    First-writer-wins attributes ordered by url (deterministic stand-in for
    the reference's file-iteration order, streamlit_app.py:111-117) and a
    sorted provenance list (files appended at streamlit_app.py:103 et al.).
    Error rows are skipped (streamlit_app.py:87-88).
    """
    exploded = (
        docs.filter(F.col("error").isNull())
        .select("url", F.explode_outer(F.col(entity_field)).alias("e"))
        .filter(F.col(f"e.{name_key}").isNotNull() & (F.col(f"e.{name_key}") != ""))
    )
    agg_cols = [
        # key includes the attribute value itself so that two same-named
        # entities within ONE document (url ties) still resolve
        # deterministically; the isNull term makes a real value beat NULL
        # (struct ordering would otherwise rank NULL fields first)
        F.min_by(
            F.col(f"e.{a}"),
            F.struct(F.col("url"), F.col(f"e.{a}").isNull(), F.col(f"e.{a}")),
        ).alias(a)
        for a in attrs
    ] + [
        F.sort_array(F.collect_set("url")).alias("files"),
        F.countDistinct("url").alias("n_files"),
    ]
    return exploded.groupBy(F.col(f"e.{name_key}").alias("name")).agg(*agg_cols)


def edges_from_docs(docs: DataFrame) -> DataFrame:
    """Explode the four relationship lists into the triple shape
    (subj, subj_class, pred, obj, obj_class, url) — exact reference edge
    semantics (streamlit_app.py:744-760):

      construct_relationships       -> (source, construct, relationship_type, target, construct)
      assessment_construct_links    -> one edge per constructs_measured element,
                                       label measurement_relationship | 'measures'
      intervention_construct_links  -> one edge per constructs_targeted element, label 'targets'
      assessment_intervention_conns -> (assessment, intervention, connection_type | 'informs')
    """
    ok = docs.filter(F.col("error").isNull())
    r = F.col("relationships")

    cc = ok.select(
        "url", F.explode_outer(r["construct_relationships"]).alias("e")
    ).select(
        F.col("e.source_construct").alias("subj"),
        F.lit("construct").alias("subj_class"),
        F.coalesce(F.col("e.relationship_type"), F.lit("")).alias("pred"),
        F.col("e.target_construct").alias("obj"),
        F.lit("construct").alias("obj_class"),
        "url",
    )

    ac = (
        ok.select("url", F.explode_outer(r["assessment_construct_links"]).alias("e"))
        .select(
            "url",
            F.col("e.assessment_name").alias("subj"),
            F.coalesce(F.col("e.measurement_relationship"), F.lit("measures")).alias("pred"),
            F.explode_outer(F.col("e.constructs_measured")).alias("obj"),
        )
        .select(
            "subj",
            F.lit("assessment").alias("subj_class"),
            "pred",
            "obj",
            F.lit("construct").alias("obj_class"),
            "url",
        )
    )

    ic = (
        ok.select("url", F.explode_outer(r["intervention_construct_links"]).alias("e"))
        .select(
            "url",
            F.col("e.intervention_name").alias("subj"),
            F.lit("targets").alias("pred"),
            F.explode_outer(F.col("e.constructs_targeted")).alias("obj"),
        )
        .select(
            "subj",
            F.lit("intervention").alias("subj_class"),
            "pred",
            "obj",
            F.lit("construct").alias("obj_class"),
            "url",
        )
    )

    ai = ok.select(
        "url", F.explode_outer(r["assessment_intervention_connections"]).alias("e")
    ).select(
        F.col("e.assessment_name").alias("subj"),
        F.lit("assessment").alias("subj_class"),
        F.coalesce(F.col("e.connection_type"), F.lit("informs")).alias("pred"),
        F.col("e.intervention_name").alias("obj"),
        F.lit("intervention").alias("obj_class"),
        "url",
    )

    return (
        cc.unionByName(ac)
        .unionByName(ic)
        .unionByName(ai)
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )


def upsert_last_wins(existing: DataFrame, new: DataFrame, key: str, order_col: str) -> DataFrame:
    """Merge new rows over existing by key; highest order_col wins, and on
    an order_col TIE the new side wins (reference merge_results last-wins
    semantics — new rows overwrite old unconditionally,
    src/extractor.py:76-104).  On Iceberg this is MERGE INTO; expressed here
    as a window dedup with an explicit side rank so ties never resolve by
    partition order."""
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        new.withColumn("_src", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc("_src"))
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_src")
    )


def coverage_report(mentions: DataFrame, lexicon_rows: list[tuple]) -> DataFrame:
    """M8's missed-entity half (SURVEY §2.3; reference `validation_guided`'s
    `ontology_coverage_check` + `potential_missed_entities`,
    /root/reference/src/prompts.py:602-641): per entity class, how many
    lexicon canonicals the corpus mentions and which are MISSED (never
    mentioned anywhere) — the deterministic corpus-scale re-expression of
    the reference's per-transcript gap review.

    Output: (entity_class, n_lexicon, n_mentioned, coverage_ratio,
    missed_entities) with missed_entities a '|'-joined sorted list (empty
    string when fully covered).  Cost: one distinct over the mention
    canonicals (small result) + a join against the tiny lexicon frame."""
    spark = mentions.sparkSession
    lex = spark.createDataFrame(
        sorted({(cls, canon) for cls, canon, _a, _p, _u in lexicon_rows}),
        "entity_class string, canonical string",
    )
    seen = (
        mentions.select("canonical", "entity_class")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = lex.join(seen, ["entity_class", "canonical"], "left")
    return joined.groupBy("entity_class").agg(
        F.count(F.lit(1)).alias("n_lexicon"),
        F.count("_hit").alias("n_mentioned"),
        F.round(F.count("_hit") / F.count(F.lit(1)), 6).alias("coverage_ratio"),
        # collect_list skips nulls and yields [] (never null) for a fully
        # covered class, so array_join already produces '' there
        F.array_join(
            F.array_sort(
                F.collect_list(F.when(F.col("_hit").isNull(), F.col("canonical")))
            ),
            "|",
        ).alias("missed_entities"),
    )


def corpus_summary(docs: DataFrame) -> DataFrame:
    """Corpus KPIs (reference summary, src/extractor.py:946-955 and
    streamlit KPIs, streamlit_app.py:344-395)."""
    return docs.agg(
        F.count(F.lit(1)).alias("total_files"),
        F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("successful"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("failed"),
        F.sum(F.size(F.coalesce(F.col("constructs"), F.array()))).alias("total_constructs"),
        F.sum(F.size(F.coalesce(F.col("assessments"), F.array()))).alias("total_assessments"),
        F.sum(F.size(F.coalesce(F.col("interventions"), F.array()))).alias("total_interventions"),
    )
