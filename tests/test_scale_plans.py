"""Plan-level evidence for the 100x-scale claims: bucketed co-located
joins (no exchange) and AQE skew-join splitting (the two mechanisms the
scale notes in README/SURVEY lean on)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed by the join key on the same bucket count join
    WITHOUT a shuffle — the co-location story for the subject-bucketed
    triples sink (Iceberg bucket(N, subj) on a cluster)."""
    triples = spark.createDataFrame(
        [(f"e{i % 50}", "measures", f"c{i}") for i in range(500)],
        ["subj", "pred", "obj"],
    )
    degrees = spark.createDataFrame(
        [(f"e{i}", i) for i in range(50)], ["subj", "degree"]
    )
    spark.sql("DROP TABLE IF EXISTS t_bucketed")
    spark.sql("DROP TABLE IF EXISTS d_bucketed")
    triples.write.bucketBy(8, "subj").sortBy("subj").saveAsTable("t_bucketed")
    degrees.write.bucketBy(8, "subj").sortBy("subj").saveAsTable("d_bucketed")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucketed").join(spark.table("d_bucketed"), "subj")
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # the whole point: neither side shuffles (bucket layout == join layout)
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 500


def test_aqe_skew_join_splits_hot_key(spark):
    """A hot key on the probe side makes AQE's OptimizeSkewedJoin split the
    oversized partition: the executed plan carries the skew=true marker.
    This is the runtime mitigation the head-entity risk notes rely on."""
    # payloads must be incompressible: shuffle-block SIZES (what the skew
    # detector reads) are post-compression, and a constant hot key with
    # constant payloads compresses below any realistic threshold
    hot = spark.range(0, 60000).select(
        F.lit("Sleep Quality").alias("subj"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    cold = spark.range(0, 2000).select(
        F.concat(F.lit("e"), F.col("id")).alias("subj"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    left = hot.union(cold)
    # the right side must be a PLAIN shuffle under the join (no aggregation):
    # OptimizeSkewedJoin splits a skewed partition by replicating the other
    # side's matching shuffle partition, which requires both children to be
    # direct shuffle stages — a distinct() here would already satisfy the
    # join's partitioning and leave nothing to replicate
    right = (
        spark.range(0, 2000)
        .select(F.concat(F.lit("e"), F.col("id")).alias("subj"))
        .union(spark.createDataFrame([("Sleep Quality",)], ["subj"]))
        .withColumn("meta", F.length("subj"))
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "subj")
        plan = _executed_plan(joined)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, plan[:2000]
    assert joined.count() == 62000
