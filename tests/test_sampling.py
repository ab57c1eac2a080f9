"""Deterministic sampling: consistency, supersets, stratified exactness."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_sample_rate_and_determinism(spark):
    docs = _docs(spark)
    n = docs.count()
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs.repartition(7), "doc_id", 0.2).collect()}
    assert s1 == s2  # partition-layout independent (unlike df.sample)
    assert 0.05 * n < len(s1) < 0.5 * n  # ~rate of distinct keys


def test_hash_sample_consistent_across_tables(spark):
    """The core property: two tables sharing the key sample the SAME keys,
    so sampled tables still join losslessly."""
    docs = _docs(spark)
    other = docs.select("doc_id", F.length("text").alias("n"))  # a 'fact' table
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(other, "doc_id", 0.3).collect()}
    assert a == b


def test_hash_sample_superset_monotone(spark):
    """Widening the rate only ADDS keys — a sample is resumable/extendable
    without redrawing."""
    docs = _docs(spark)
    s_small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s_big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4).collect()}
    assert s_small < s_big


def test_hash_sample_rejects_bad_rate(spark):
    import pytest

    with pytest.raises(ValueError, match="rate"):
        hash_sample(_docs(spark), "doc_id", 1.5)


def test_stratified_exact_n_per_group(spark):
    docs = _docs(spark)
    out = stratified_hash_sample(docs, ["source"], 4, "doc_id")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in per.items():
        assert n == min(4, sizes[src])
    # deterministic across partitionings
    a = sorted((r["source"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["source"], r["doc_id"])
        for r in stratified_hash_sample(docs.repartition(5), ["source"], 4, "doc_id").collect()
    )
    assert a == b


def test_curation_chain_semantics(spark):
    """plans/curate contracts: lang gate, quality floor, exact-dup collapse,
    cluster representatives only, sample-last subset.  The raw corpus has
    no exact duplicates, so byte-dups of two real docs are INJECTED to make
    the exact-dedup stage bite (lang/quality/near-dup bite natively)."""
    from ontology_pipeline_spark.plans.curate import curate_documents
    from ontology_pipeline_spark.operators.text_analysis import fingerprint

    raw = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    dups = (
        raw.orderBy("doc_id").limit(2)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    docs = raw.unionByName(dups.select(*raw.columns))
    out = curate_documents(docs).cache()
    # injected byte-dups never survive (original doc_id is smaller)
    assert out.filter(F.col("doc_id") >= 100000).count() == 0
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out < n_in
    assert out.filter(F.col("lang_pred") != "en").count() == 0
    assert out.filter(F.col("quality") < 0.5).count() == 0
    # no two survivors share a normalized-content fingerprint
    fps = out.select(fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()
    # sample-last: the sampled chain is a subset of the unsampled chain
    sampled = curate_documents(docs, sample_rate=0.5)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    sids = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    assert sids < ids


def test_curation_chain_with_clean_and_structural_stages(spark):
    """The optional round-3 pre-stages compose into the chain: boilerplate /
    PII / symbol-soup documents are cleaned or gated out BEFORE the
    language gate, and the default chain (both flags off) is unchanged."""
    from ontology_pipeline_spark.plans.curate import curate_documents

    docs = spark.createDataFrame(
        [
            (1, "This corpus page carries real varied prose that survives every curation gate applied here today. "
                "It continues with several additional meaningful sentences about measurement and training quality. "
                "The vocabulary stays diverse and the lines end with punctuation."),
            (2, "Home | About | Contact\n" * 10 + "One real line with an email a@b.io inside it."),
            (3, "{{{### }}} <<>> |||| ^^ ~~ [[[]]] " * 20),
        ],
        ["doc_id", "text"],
    )
    base = {r["doc_id"] for r in curate_documents(docs, min_quality=0.0).collect()}
    curated = curate_documents(
        docs, min_quality=0.0, clean=True, structural_gate=True
    )
    rows = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert 3 not in rows          # symbol soup fails the structural gate
    assert 1 in rows              # prose survives both new stages
    if 2 in rows:                 # if doc 2 survives, its PII is masked and
        assert "a@b.io" not in rows[2]  # the nav boilerplate lines are gone
        assert "Home | About" not in rows[2]
    assert 1 in base              # default chain still runs without the stages
    # the cleaned text must be PINNED before the gates read it: without the
    # checkpoint Catalyst substitutes the regexp clean chain into every gate
    # sub-signal (measured 9.7x wall on 100k pages).  A checkpoint scan in
    # the plan is the regression guard.
    plan = curated._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan


def test_mixture_sample_per_group_rates_and_monotonicity(spark):
    from ontology_pipeline_spark.operators.sampling import hash_sample, mixture_sample

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
    )
    out = mixture_sample(
        docs, "source", {"books": 1.0, "web": 0.3}, key_col="doc_id"
    )
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("books") == 1000          # rate 1.0 keeps everything
    assert "code" not in by_src                  # default_rate 0 drops the group
    assert 200 <= by_src.get("web", 0) <= 400    # ~30% of 1000
    # per-group selection == plain hash_sample at that group's rate
    web_mix = {r["doc_id"] for r in out.filter("source = 'web'").collect()}
    web_ref = {
        r["doc_id"]
        for r in hash_sample(docs.filter("source = 'web'"), "doc_id", 0.3).collect()
    }
    assert web_mix == web_ref
    # superset-monotone: raising web's rate only adds rows
    wider = {
        r["doc_id"]
        for r in mixture_sample(
            docs, "source", {"books": 1.0, "web": 0.6}, key_col="doc_id"
        ).filter("source = 'web'").collect()
    }
    assert web_mix <= wider


def test_mixture_sample_rejects_bad_rates(spark):
    from ontology_pipeline_spark.operators.sampling import mixture_sample

    docs = spark.range(3).select(F.col("id").alias("doc_id"), F.lit("web").alias("source"))
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {"web": 1.5}, key_col="doc_id")
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {}, key_col="doc_id", default_rate=-0.1)


def test_mixture_sample_plan_is_narrow(spark):
    from ontology_pipeline_spark.operators.sampling import mixture_sample

    docs = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("web").alias("source"))
    plan = (
        mixture_sample(docs, "source", {"web": 0.5}, key_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_curation_chain_with_decontamination_stage(spark):
    """benchmark= appends the eval-set decontamination stage after dedup:
    survivors sharing a 7-gram with the benchmark are dropped, everything
    else is identical to the default chain."""
    from ontology_pipeline_spark.plans.curate import curate_documents

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = curate_documents(docs)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    # benchmark = the text of one surviving doc -> that doc (at least) drops
    victim = min(base_ids)
    bench = docs.filter(F.col("doc_id") == victim).select("text")
    out = curate_documents(docs, benchmark=bench, decontaminate_n=7)
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert victim not in out_ids
    assert out_ids < base_ids  # only drops, never adds


def test_curation_chain_with_span_removal_stage(spark):
    """drop_spans=True rewrites survivors' text so no cross-doc >= span_n
    token run survives twice; ids never change (removal edits text, it
    does not drop documents) and the extra n_dropped_tokens column lands."""
    from ontology_pipeline_spark.operators.dedup import duplicated_spans
    from ontology_pipeline_spark.plans.curate import curate_documents

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # high-quality English-looking prose so the gates keep everything
        (i, f"the report number {i} says that {run} and the team agreed it was a useful result overall")
        for i in range(6)
    ] + [(9, "the unrelated document talks about other matters entirely and shares no long run with anything")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = curate_documents(docs, min_quality=0.0, dedup_threshold=0.99)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    out = curate_documents(
        docs, min_quality=0.0, dedup_threshold=0.99,
        drop_spans=True, span_n=10, span_min_docs=2,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == base_ids
    assert "n_dropped_tokens" in out.columns
    survivors = out.select("doc_id", "text")
    assert duplicated_spans(survivors, n=10, min_docs=2).collect() == []
    # exactly one surviving doc still carries the run
    assert sum(run in r["text"] for r in got.values()) == 1
