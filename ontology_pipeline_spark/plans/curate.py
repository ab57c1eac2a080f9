"""Training-data curation chain — the composition a 100 TB corpus pipeline
runs before anything else touches the data:

    documents -> (optional) clean: C4 line filter + PII redaction
              -> (optional) structural gate (Gopher repetition/shape flags)
              -> language gate -> quality floor -> exact dedup
              -> transitive near-dup drop
              -> (optional) cross-doc duplicated-span removal
              -> (optional) benchmark decontamination
              -> (optional) consistent sample

Every stage is an existing engine operator (text_analysis, dedup, sampling)
composed declaratively; the chain stays shuffle-lean: the gates are narrow
filters fused into the scan, exact dedup is one shuffle on the fingerprint,
the near-dup stage is the banded-LSH + connected-components path (never
O(n^2)), and the sample is a narrow filter again.

The full chain is value-checked end-to-end by the `curated_documents`
driver query: the language/quality/exact-dedup stages re-derived in DuckDB
SQL, the near-dup drop decisions replayed independently in pure Python
(scripts/golden_replay.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clean import clean_documents
from ..operators.decontaminate import decontaminate
from ..operators.dedup import (
    drop_duplicated_spans,
    exact_dedup,
    minhash_dedup_clusters,
)
from ..operators.sampling import hash_sample
from ..operators.text_analysis import lang_id, quality_score, structural_flags


def gate_documents(
    docs: DataFrame,
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
    clean: bool = False,
    structural_gate: bool = False,
) -> DataFrame:
    """The narrow per-row gate stage shared by the batch chain
    (:func:`curate_documents`) and the incremental one (plans/ingest.py):
    optional clean + structural gate, then language gate and quality floor.
    Adds `lang_pred` and `quality` columns; everything fuses into the scan
    (no shuffle, no Python)."""
    if clean:
        # pin the cleaned text before ANY gate reads it: Catalyst pushes
        # downstream filter predicates through the cleaning projection and
        # substitutes the whole regexp chain into every gate sub-signal
        # (structural_flags alone embeds it 6x; measured 9.7x wall on 100k
        # pages, the same trap as the multi-consumer rule in CLAUDE.md)
        docs = clean_documents(docs, text_col).localCheckpoint(eager=False)
    if structural_gate:
        docs = docs.filter(structural_flags(F.col(text_col)))
    return (
        docs.withColumn("lang_pred", lang_id(F.col(text_col)))
        .filter(F.col("lang_pred") == lang)
        .withColumn("quality", quality_score(F.col(text_col)))
        .filter(F.col("quality") >= min_quality)
    )


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    dedup_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 2,
    sample_rate: float | None = None,
    clean: bool = False,
    structural_gate: bool = False,
    max_bucket_size: int | None = 2048,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    drop_spans: bool = False,
    span_n: int = 50,
    span_min_docs: int = 2,
) -> DataFrame:
    """Surviving rows plus `lang_pred` and `quality` columns.

    Order matters and is part of the contract: gates first (cheap, narrow,
    shrink the corpus before any shuffle), exact dedup before near-dup
    (byte-dups would otherwise waste LSH work pairing with themselves),
    near-dup keeps each cluster's min-id representative, and the optional
    sample runs last so its rate applies to the CURATED population.

    ``clean=True`` prepends the web-text cleaning stage (C4 line filter +
    PII redaction, operators/clean.py) and ``structural_gate=True`` the
    Gopher-style repetition/shape gate — both narrow expressions that fuse
    into the same scan as the language/quality gates.  Both default OFF:
    the `curated_documents` golden replay pins the 5-stage chain, and the
    driver's synthetic corpus is already clean prose.

    ``drop_spans=True`` inserts cross-document duplicated-span REMOVAL
    (dedup.drop_duplicated_spans: every >= ``span_n``-token run shared by
    >= ``span_min_docs`` docs survives once, least-(id, pos) owner) after
    the document-level near-dup drop; output then carries an extra
    ``n_dropped_tokens`` column.  Default OFF (golden pin).

    ``benchmark`` (a frame with `text_col`) appends the eval-set
    decontamination stage (operators/decontaminate.py): survivors sharing
    any ``decontaminate_n``-gram with the benchmark are dropped after dedup
    and before the sample.  Default OFF for the same golden-pin reason as
    the other optional stages.

    ``max_bucket_size`` caps LSH band buckets in the near-dup stage (hot
    buckets on boilerplate corpora make the candidate join quadratic; see
    dedup.minhash_lsh_pairs).  The 2048 default is a no-op on any corpus
    whose buckets stay sane — including the golden fixture — while keeping
    the chain's wall time bounded on templated web text."""
    d = gate_documents(
        docs,
        text_col,
        lang=lang,
        min_quality=min_quality,
        clean=clean,
        structural_gate=structural_gate,
    )
    d = exact_dedup(d, text_col, id_col)
    # pin: the survivor frame feeds BOTH the cluster computation and the
    # final anti-join (multi-consumer rule)
    d = d.localCheckpoint(eager=False)
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
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    d = d.join(drop, id_col, "left_anti")
    if drop_spans:
        # span-level removal AFTER document-level dedup (whole-document
        # near-dups are already gone, so only genuinely partial overlaps
        # pay the gram scan) and BEFORE decontamination (the benchmark
        # grams should be checked against the text that will actually
        # ship).  drop_duplicated_spans pins `d` internally (it consumes
        # the frame twice — multi-consumer rule).
        d = drop_duplicated_spans(
            d, id_col=id_col, text_col=text_col, n=span_n, min_docs=span_min_docs
        )
    if benchmark is not None:
        # decontaminate AFTER dedup (fewer docs to shingle) and BEFORE the
        # sample (the rate should apply to the decontaminated population);
        # broadcast gram semi-join, corpus side stays un-shuffled.
        # decontaminate() pins `d` internally (its default pin=True): it
        # consumes the frame twice, and the unpinned near-dup anti-join
        # subtree would re-execute per consumer (multi-consumer rule).
        d = decontaminate(
            d, benchmark, id_col=id_col, text_col=text_col, n=decontaminate_n
        )
    if sample_rate is not None:
        d = hash_sample(d, id_col, sample_rate)
    return d
