"""Capacity probe: fused KG extraction throughput at large page counts.

Generates the corpus ON THE EXECUTORS (synth.distributed_pages — the driver
never holds it), writes it once to .bench_data/, then times the fused
HTML->text->mentions->triples stage + distinct-triple aggregation, best of
RUNS.  Usage:

    python scripts/capacity_probe.py [n_pages] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = 3
SEED = 7


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ontology_pipeline_spark.lexicon import lexicon_rows
    from ontology_pipeline_spark.operators.relations import distinct_triples
    from ontology_pipeline_spark.plans.pipeline import build_triples
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import SYNTH_VERSION, distributed_pages

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=max(64, cores * 2))
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(
        REPO, ".bench_data", f"dist_pages_v{SYNTH_VERSION}_n{n_pages}_s{SEED}"
    )
    t0 = time.time()
    # _SUCCESS gate: a partial directory from an interrupted write must be
    # regenerated, not silently benchmarked as the full corpus
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        distributed_pages(spark, n_pages, seed=SEED).write.mode("overwrite").parquet(path)
        print(f"generated {n_pages} pages in {time.time()-t0:.1f}s", file=sys.stderr)

    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(4 << 20, total_bytes // (cores * 4)))
    )
    pages = spark.read.parquet(path)
    lex = lexicon_rows()

    def job() -> int:
        return distinct_triples(build_triples(pages, lex)).count()

    n_distinct = job()  # warm-up
    n_triples = build_triples(pages, lex).count()
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "pages": n_pages,
                "cores": cores,
                "corpus_gb": round(total_bytes / 1e9, 2),
                "emitted_triples": n_triples,
                "distinct_triples": n_distinct,
                "times": [round(t, 1) for t in times],
                "best_sec": round(best, 1),
                "triples_per_sec": round(n_triples / best),
                "pages_per_sec": round(n_pages / best),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
