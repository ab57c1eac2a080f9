"""End-to-end KG-construction plan (the engine's EP1 analog; reference
lifecycle at main.py:282-292 -> src/extractor.py:918-977).

    pages --anti-join lineage--> extract_text -> triples (fused mention+pair)
      -> append to triples sink (bucketed by subject hash)
      -> append per-url lineage rows (resume checkpoint)

Resume semantics mirror the reference exactly: `load_existing_results` +
"skip already-processed files" (src/extractor.py:46-74, :934-935) becomes a
left_anti join of pages against committed lineage urls; re-running after a
partial failure recomputes only missing urls and the final triple set is
identical (tested).

Sink layout (parquet here; Iceberg `writeTo(...).append()` on a real
cluster — same plan shape):
    <out>/triples/   bucket=<pmod(xxhash64(subj), n_buckets)>/part-*.parquet
    <out>/lineage/   run_id=<run>/part-*.parquet
Bucketing by subject hash co-locates each entity's edges, so downstream
per-subject aggregations and ego-subgraph joins read few buckets instead of
the whole table.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relations import (
    distinct_triples,
    extract_triples_from_html,
    extract_triples_fused,
)
from ..lexicon import lexicon_rows as default_lexicon_rows

N_SUBJECT_BUCKETS = 32


def build_triples(
    pages: DataFrame,
    lexicon_rows: list[tuple] | None = None,
    from_html: bool = True,
) -> DataFrame:
    """pages -> per-page triples (one shuffle-free fused Python stage)."""
    # `is None`, not truthiness: an explicitly passed empty lexicon means
    # "extract nothing", not "use the default vocabulary"
    lex = default_lexicon_rows() if lexicon_rows is None else lexicon_rows
    if from_html:
        return extract_triples_from_html(pages, lex)
    return extract_triples_fused(pages, lex)


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    run_id: str | None = None,
    lexicon_rows: list[tuple] | None = None,
    resume: bool = True,
    from_html: bool = True,
) -> dict:
    """Execute one (resumable) batch commit. Returns summary counters,
    mirroring the reference's corpus summary (src/extractor.py:946-955)."""
    run_id = run_id or dt.datetime.now(dt.timezone.utc).strftime("run_%Y%m%dT%H%M%S%f")
    triples_path = os.path.join(out_dir, "triples")
    lineage_path = os.path.join(out_dir, "lineage")

    pages = spark.read.parquet(pages_path)
    total_pages = pages.count()

    if resume and _exists(spark, lineage_path):
        # Exclude THIS run_id from the done-set: a same-run_id retry after a
        # crash mid-lineage-append would otherwise skip the urls whose lineage
        # rows landed before the crash, and the dynamic (run_id, bucket)
        # partition overwrite below would then REPLACE bucket partitions that
        # also hold those urls' triples — permanently losing committed rows
        # (their lineage would claim them committed with no rows behind it).
        # Reprocessing the whole run under its own run_id makes the overwrite
        # complete and idempotent; urls committed under OTHER runs stay skipped.
        done = (
            spark.read.parquet(lineage_path)
            .filter(F.col("run_id") != run_id)
            .select("url")
            .distinct()
        )
        pages = pages.join(done, "url", "left_anti")

    pages = pages.localCheckpoint(eager=False)
    new_pages = pages.count()
    if new_pages == 0:
        return {
            "run_id": run_id,
            "total_pages": total_pages,
            "new_pages": 0,
            "new_triples": 0,
        }

    # Commit protocol (atomicity): triples land under their run_id partition
    # FIRST, the lineage rows that reference the run_id land SECOND, and
    # read_triples only surfaces runs present in lineage.  A crash between
    # the two writes leaves an orphan run partition that readers never see
    # and the next resume run reprocesses cleanly — no duplicate triples in
    # the committed view (the Iceberg analog is a single snapshot commit).
    triples = build_triples(pages, lexicon_rows, from_html=from_html)
    triples_b = triples.withColumn(
        "bucket", F.pmod(F.xxhash64("subj"), F.lit(N_SUBJECT_BUCKETS))
    ).withColumn("run_id", F.lit(run_id))
    # dynamic partition overwrite, not append: retrying a crashed run with
    # the SAME caller-supplied run_id must replace that run's partitions, or
    # the retry would append a second copy of every triple under them
    (
        triples_b.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id", "bucket")
        .parquet(triples_path)
    )

    # per-url lineage: every new page commits a row even if it emitted no
    # triples (negative pages must not be reprocessed forever).  Reads back
    # ONLY this run's partition (pruned scan — O(new pages), not O(corpus)).
    per_url = (
        spark.read.parquet(triples_path)
        .filter(F.col("run_id") == run_id)
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_triples"))
    )
    lineage = (
        pages.select("url")
        .join(per_url, "url", "left")
        .select(
            "url",
            F.lit(run_id).alias("run_id"),
            F.lit(None).cast("long").alias("n_mentions"),
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
            F.lit("ok").alias("status"),
            F.lit(None).cast("string").alias("error"),
            F.current_timestamp().alias("committed_ts"),
        )
    )
    lineage.write.mode("append").parquet(lineage_path)

    new_triples = int(per_url.agg(F.sum("n_triples")).first()[0] or 0)
    summary = {
        "run_id": run_id,
        "total_pages": total_pages,
        "new_pages": new_pages,
        "new_triples": new_triples,
    }
    # run-level metrics row alongside the commit (reference corpus summary,
    # src/extractor.py:946-955; north rule: lineage + metrics per commit)
    spark.createDataFrame(
        [(run_id, total_pages, new_pages, new_triples)],
        "run_id string, total_pages long, new_pages long, new_triples long",
    ).withColumn("committed_ts", F.current_timestamp()).write.mode("append").parquet(
        os.path.join(out_dir, "metrics")
    )
    return summary


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed triples only: the committed view is the semi-join of the
    triples sink against lineage on (run_id, url).  This makes BOTH crash
    windows safe: an orphan run partition (crash before any lineage landed)
    is invisible, and a PARTIAL lineage commit (crash mid-append: some urls'
    rows landed, others not) exposes exactly the landed urls — the missing
    urls are reprocessed by the next resume under a new run_id and only that
    run's copy is visible, never both.  (On Iceberg a single snapshot commit
    replaces this pair-join.)"""
    t = spark.read.parquet(os.path.join(out_dir, "triples"))
    lineage_path = os.path.join(out_dir, "lineage")
    if not _exists(spark, lineage_path):
        return t.filter(F.lit(False)).drop("bucket", "run_id")
    # lineage is one row per processed url — no broadcast hint (at corpus
    # scale it is NOT small); Catalyst/AQE picks the strategy, and on Iceberg
    # the snapshot mechanism removes the join entirely
    committed = spark.read.parquet(lineage_path).select("run_id", "url").distinct()
    return t.join(committed, ["run_id", "url"], "left_semi").drop("bucket", "run_id")


def corpus_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Distinct corpus-level knowledge graph with provenance."""
    return distinct_triples(read_triples(spark, out_dir))


def _exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe (works for local paths and object stores
    without the noisy analyzer WARN a speculative read would log)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))
