from __future__ import annotations

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.decontaminate import (
    benchmark_ngrams,
    contamination_hits,
    decontaminate,
)


def _docs(spark):
    rows = [
        # 0: clean — shares words but never a full 3-gram with the benchmark
        (0, "alpha beta gamma delta epsilon zeta"),
        # 1: contaminated — contains benchmark doc B0's 3-gram verbatim
        (1, "noise words the quick brown fox jumps more noise"),
        # 2: contaminated — verbatim copy of benchmark doc B1
        (2, "Pack my box with five dozen jugs"),
        # 3: clean — reordered benchmark words (no shared 3-gram)
        (3, "brown quick the fox dozen five"),
        # 4: case/whitespace normalization still hits
        (4, "header   THE QUICK BROWN fox trailer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    rows = [
        ("the quick brown fox jumps over the lazy dog",),
        ("pack my box with five dozen jugs",),
    ]
    return spark.createDataFrame(rows, "text string")


def test_contamination_hits_and_counts(spark):
    grams = benchmark_ngrams(_bench(spark), n=3)
    hits = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contamination_hits(_docs(spark), grams, n=3).collect()
    }
    # doc 1 contains "the quick brown fox jumps": 3-grams = {the quick brown,
    # quick brown fox, brown fox jumps} -> 3 hit grams
    # doc 2 is a verbatim 7-token copy -> 7-3+1 = 5 hit grams
    # doc 4 hits {the quick brown, quick brown fox}
    assert hits == {1: 3, 2: 5, 4: 2}


def test_decontaminate_drops_only_contaminated(spark):
    out = decontaminate(_docs(spark), _bench(spark), n=3)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 3]
    # schema passes through untouched
    assert out.columns == ["doc_id", "text"]


def test_gram_distinctness_counts_grams_not_occurrences(spark):
    # the same benchmark gram repeated in one doc counts once
    docs = spark.createDataFrame(
        [(9, "the quick brown filler the quick brown")],
        "doc_id long, text string",
    )
    grams = benchmark_ngrams(_bench(spark), n=3)
    out = contamination_hits(docs, grams, n=3).collect()
    assert [(r["doc_id"], r["n_hit_grams"]) for r in out] == [(9, 1)]


def test_benchmark_side_is_broadcast(spark):
    """The corpus side must never shuffle for candidate generation: the
    benchmark-gram semi-join and the hit anti-join are both broadcast."""
    plan = decontaminate(_docs(spark), _bench(spark), n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    joins = [ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln]
    assert all("Broadcast" in ln for ln in joins), joins
