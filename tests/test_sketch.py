"""KMV distinct sketch: accuracy, exactness below k, merge law."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.sketch import (
    estimate_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)

K = 64


def _df(spark, groups):
    """groups: {group: n_distinct}; values get per-group disjoint prefixes,
    each value duplicated 3x to prove dedup."""
    rows = []
    for g, n in groups.items():
        for i in range(n):
            rows.extend((g, f"{g}:v{i}") for _ in range(3))
    return spark.createDataFrame(rows, ["g", "v"])


def test_exact_below_k(spark):
    df = _df(spark, {"a": 10, "b": 63})
    got = {r["g"]: r["est_distinct"] for r in estimate_distinct(df, ["g"], "v", K).collect()}
    assert got == {"a": 10.0, "b": 63.0}


def test_estimate_accuracy_above_k(spark):
    df = _df(spark, {"big": 5000})
    est = estimate_distinct(df, ["g"], "v", K).collect()[0]["est_distinct"]
    # rel error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.4
    assert est != 5000  # genuinely an estimate


def test_merge_equals_sketch_of_union(spark):
    a = _df(spark, {"g": 300})
    b = spark.createDataFrame(
        [("g", f"g:w{i}") for i in range(250)], ["g", "v"]
    )
    sa = kmv_sketch(a, ["g"], "v", K).select(F.col("sketch").alias("sa"))
    sb = kmv_sketch(b, ["g"], "v", K).select(F.col("sketch").alias("sb"))
    merged = sa.crossJoin(sb).select(kmv_merge(F.col("sa"), F.col("sb"), K).alias("sketch"))
    union_sketch = kmv_sketch(a.union(b), ["g"], "v", K)
    assert merged.collect()[0]["sketch"] == union_sketch.collect()[0]["sketch"]


def test_nulls_excluded_like_count_distinct(spark):
    """Regression: NULL values must not enter the sketch (COUNT(DISTINCT)
    semantics), and an all-NULL group still appears with estimate 0."""
    df = spark.createDataFrame(
        [("a", "v1"), ("a", None), ("a", "v2"), ("b", None)], ["g", "v"]
    )
    got = {r["g"]: r["est_distinct"] for r in estimate_distinct(df, ["g"], "v", K).collect()}
    assert got == {"a": 2.0, "b": 0.0}


def test_sketch_keeps_long_precision(spark):
    """Regression (VERDICT r1 #4): the sketch must hold RAW 64-bit hashes,
    not doubles — a double cast before dedup collides distinct hashes within
    2^11 of each other and deflates estimates.  Checks dtype and that the
    estimate equals an exact replay of (k-1)/unit(kth) from the raw longs."""
    df = _df(spark, {"big": 500})
    sk = kmv_sketch(df, ["g"], "v", K).collect()[0]["sketch"]
    assert all(isinstance(h, int) for h in sk) and len(sk) == K
    assert sk == sorted(sk)
    kth_unit = (sk[K - 1] + float(1 << 63)) / float(1 << 64)
    expected = round((K - 1) / kth_unit, 1)
    est = (
        spark.range(1)
        .select(kmv_estimate(F.array(*[F.lit(h) for h in sk]), K).alias("e"))
        .collect()[0]["e"]
    )
    assert est == expected


def test_deterministic_across_runs(spark):
    df = _df(spark, {"x": 1000}).repartition(16)
    e1 = estimate_distinct(df, ["g"], "v", K).collect()[0]["est_distinct"]
    e2 = estimate_distinct(df.repartition(3), ["g"], "v", K).collect()[0]["est_distinct"]
    assert e1 == e2
