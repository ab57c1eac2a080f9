"""Incremental (shard-at-a-time) corpus curation — the daily-ingest analog
of plans/curate.py, against PERSISTED dedup state instead of the full corpus.

    new shard --gates (clean/structural/lang/quality)-->
      --exact_dedup_against (persisted fingerprint table)-->
      --intra-shard minhash_dedup_clusters drop-->
      --cross-shard minhash_probe_near_dups drop (persisted MinHash index)-->
      survivors -> append documents + fingerprints + index rows + lineage

Semantic anchor: the reference's resume/merge (`load_existing_results` +
skip-processed at /root/reference/src/extractor.py:46-104) is exactly this
shape at file granularity; here the unit is a corpus shard and the "existing
results" are the dedup state tables.  plans/pipeline.py composes the same
protocol for KG construction; this module composes it for curation.

Commit protocol (mirrors plans/pipeline.py): state partitions land under
their shard_id FIRST (dynamic partition overwrite — a same-shard_id retry
replaces, never double-appends), the lineage row that names the shard_id
lands SECOND, and every read goes through the committed view (semi-join
against lineage shard_ids).  A crash between the two writes leaves orphan
shard partitions that readers never see; the retry overwrites them cleanly.

Scale notes (100 TB):
* The historical corpus TEXT is never re-read.  Each ingest touches the new
  shard plus two slim state tables: fingerprints (32-char keys) and the
  (band, bucket, doc_id, signature) MinHash index, both partitioned by
  shard_id on disk; write them bucketed by fp / (band, bucket) on a real
  cluster and the anti-join/probe become co-located lookups.
* Only the shard is tokenized/shingled; the probe's candidate space is band
  -collision bounded AND hot-bucket capped (``max_bucket_size`` prunes
  template/boilerplate-family buckets on both sides before the join — the
  piece that keeps the probe O(shard) as the index grows; see
  operators/dedup.py:minhash_probe_near_dups).
* Known, standard trade-off vs the batch chain: near-dup transitivity is
  not re-closed across history (a shard doc connected to history only
  THROUGH another same-shard doc that got dropped intra-shard can survive
  where the batch chain would drop it).  Direct cross-shard duplicates —
  exact or banded-LSH-visible — are always caught, with estimates identical
  to a full-corpus run (shared `dedup.minhash_coeffs` schedule).  The
  two-shard == one-batch equivalence test in tests/test_ingest.py holds on
  corpora without such cross-shard chains.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup_against,
    exact_fingerprints,
    minhash_dedup_clusters,
    minhash_index,
    minhash_probe_near_dups,
)
from .curate import gate_documents


class ParquetStateStore:
    """Persisted curation state (local/parquet impl of the seam; an Iceberg
    deployment maps each directory to a table and the dynamic partition
    overwrite to `overwritePartitions()`, exactly like the triple sink).

        <root>/documents/shard_id=<s>/     curated survivors (full rows)
        <root>/fingerprints/shard_id=<s>/  (doc_id, fp)
        <root>/minhash_index/shard_id=<s>/ (band, bucket, doc_id, signature)
        <root>/lineage/shard_id=<s>/       one commit row per shard (append)
    """

    def __init__(self, root: str):
        self.root = root
        self.documents_path = os.path.join(root, "documents")
        self.fingerprints_path = os.path.join(root, "fingerprints")
        self.index_path = os.path.join(root, "minhash_index")
        self.lineage_path = os.path.join(root, "lineage")

    # -- committed view ----------------------------------------------------
    def committed_shards(self, spark: SparkSession) -> DataFrame | None:
        """Distinct shard_ids with a landed lineage row (None = no state)."""
        from ..sources.tables import _hadoop_exists

        if not _hadoop_exists(spark, self.lineage_path):
            return None
        return spark.read.parquet(self.lineage_path).select("shard_id").distinct()

    def read_lineage(self, spark: SparkSession) -> DataFrame | None:
        from ..sources.tables import _hadoop_exists

        if not _hadoop_exists(spark, self.lineage_path):
            return None
        return spark.read.parquet(self.lineage_path)

    def _read_committed(self, spark: SparkSession, path: str) -> DataFrame | None:
        """Committed-only view of a state table: semi-join on lineage
        shard_ids makes orphan (crashed, pre-lineage) partitions invisible."""
        from ..sources.tables import _hadoop_exists

        committed = self.committed_shards(spark)
        if committed is None or not _hadoop_exists(spark, path):
            return None
        return spark.read.parquet(path).join(committed, "shard_id", "left_semi")

    def read_fingerprints(self, spark: SparkSession) -> DataFrame | None:
        return self._read_committed(spark, self.fingerprints_path)

    def read_index(self, spark: SparkSession) -> DataFrame | None:
        return self._read_committed(spark, self.index_path)

    def read_documents(self, spark: SparkSession) -> DataFrame | None:
        d = self._read_committed(spark, self.documents_path)
        return None if d is None else d.drop("shard_id")

    # -- commit (phase 1: state partitions, phase 2: lineage) ---------------
    def _overwrite_shard(self, df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard_id")
            .parquet(path)
        )

    def write_shard_state(
        self, documents: DataFrame, fingerprints: DataFrame, index: DataFrame
    ) -> None:
        self._overwrite_shard(documents, self.documents_path)
        self._overwrite_shard(fingerprints, self.fingerprints_path)
        self._overwrite_shard(index, self.index_path)

    def append_lineage(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy("shard_id").parquet(self.lineage_path)


def ingest_shard(
    spark: SparkSession,
    shard: DataFrame,
    state_dir: str | None = None,
    shard_id: str = "shard_000",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    dedup_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 2,
    clean: bool = False,
    structural_gate: bool = False,
    max_bucket_size: int | None = 2048,
    resume: bool = True,
    store: ParquetStateStore | None = None,
) -> dict:
    """Curate one new shard against the persisted state and commit it.
    Returns summary counters (mirroring run_pipeline's contract).

    Idempotency: an already-committed shard_id is skipped when ``resume``
    (new_docs 0); a crashed same-shard_id retry reprocesses and REPLACES its
    partitions (dynamic overwrite), so no double-append is possible.

    The MinHash geometry (num_hashes, bands, shingle_n) is part of the
    persisted index's identity: a mismatch against what previous ingests
    committed raises instead of silently probing an incompatible index."""
    if store is None:
        if state_dir is None:
            raise ValueError("ingest_shard needs state_dir or an explicit store")
        store = ParquetStateStore(state_dir)

    lineage = store.read_lineage(spark)
    if lineage is not None:
        first = lineage.select("num_hashes", "bands", "shingle_n").first()
        if first is not None and (
            (first["num_hashes"], first["bands"], first["shingle_n"])
            != (num_hashes, bands, shingle_n)
        ):
            raise ValueError(
                "MinHash geometry mismatch vs persisted state: committed "
                f"(num_hashes={first['num_hashes']}, bands={first['bands']}, "
                f"shingle_n={first['shingle_n']}), got ({num_hashes}, {bands}, "
                f"{shingle_n}) — rebuild the index or match the parameters"
            )
        if resume and lineage.filter(F.col("shard_id") == shard_id).first() is not None:
            return {"shard_id": shard_id, "total_docs": None, "new_docs": 0}

    total = shard.count()
    gated = gate_documents(
        shard,
        text_col,
        lang=lang,
        min_quality=min_quality,
        clean=clean,
        structural_gate=structural_gate,
    )

    seen_fps = store.read_fingerprints(spark)
    if seen_fps is None:
        # first shard: exact_dedup_against with an empty fingerprint table
        # degenerates to intra-shard exact dedup
        seen_fps = spark.createDataFrame([], "doc_id long, fp string")
    # pin: the exact-survivor frame feeds the intra-shard cluster computation,
    # its own anti-join, AND the counter (multi-consumer rule)
    d = exact_dedup_against(gated, seen_fps, text_col, id_col).localCheckpoint(
        eager=False
    )
    n_exact = d.count()

    clusters = minhash_dedup_clusters(
        d,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=dedup_threshold,
        max_bucket_size=max_bucket_size,
    )
    intra_drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    d = d.join(intra_drop, id_col, "left_anti").localCheckpoint(eager=False)
    n_intra = d.count()

    index = store.read_index(spark)
    if index is not None:
        cross = minhash_probe_near_dups(
            d,
            index.drop("shard_id"),
            text_col,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            threshold=dedup_threshold,
            max_bucket_size=max_bucket_size,
        ).select(F.col("new_id").alias(id_col)).distinct()
        d = d.join(cross, id_col, "left_anti")

    # pin the final survivors: they feed the document write, the fingerprint
    # derivation, the index build (which itself re-reads text), and the count
    d = d.localCheckpoint(eager=True)
    n_survivors = d.count()

    stamp = F.lit(shard_id).alias("shard_id")
    store.write_shard_state(
        d.select("*", stamp),
        exact_fingerprints(d, text_col, id_col).select("*", stamp),
        minhash_index(
            d, text_col, id_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
        ).select("*", stamp),
    )
    store.append_lineage(
        spark.createDataFrame(
            [
                (
                    shard_id,
                    total,
                    n_exact,
                    n_intra,
                    n_survivors,
                    num_hashes,
                    bands,
                    shingle_n,
                    float(dedup_threshold),
                )
            ],
            "shard_id string, total_docs long, exact_survivors long, "
            "intra_survivors long, new_docs long, num_hashes int, bands int, "
            "shingle_n int, threshold double",
        ).withColumn("committed_ts", F.current_timestamp())
    )
    return {
        "shard_id": shard_id,
        "total_docs": total,
        "exact_survivors": n_exact,
        "intra_survivors": n_intra,
        "new_docs": n_survivors,
    }


def read_curated(
    spark: SparkSession, state_dir: str | None = None, store: ParquetStateStore | None = None
) -> DataFrame:
    """All committed curated documents across ingested shards (orphan
    partitions from crashed ingests are invisible — see module docstring)."""
    if store is None:
        if state_dir is None:
            raise ValueError("read_curated needs state_dir or an explicit store")
        store = ParquetStateStore(state_dir)
    d = store.read_documents(spark)
    if d is None:
        raise ValueError(f"no committed state under {store.root}")
    return d
