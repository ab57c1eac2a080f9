"""pack_chunks group-count tuning probe -> note in BENCH/training_prep.md.

VERDICT r3 #6: the chunk+pack chain's normalized 8->32 efficiency (0.646)
trails the narrow chunk chain (0.838) — hypothesis: per-group Arrow batch
contention, testable by raising the group count (more, smaller groups) at a
constant token budget.  This probe pins the chunk table once
(localCheckpoint) so ONLY the pack stage (shuffle on the shard key + one
applyInPandas per group) is timed, then sweeps n_groups multipliers at two
parallelism levels.

Usage: python scripts/pack_tuning_probe.py            # full sweep
       python scripts/pack_tuning_probe.py --worker 32 # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

N_PAGES = int(os.environ.get("SPARK_GRAFT_PACK_N", "2000000"))
SEED = 23
RUNS = 3
MULTIPLIERS = (1, 4, 16, 64)
CORPUS = os.path.join(REPO, ".bench_data", f"prep_v1_n{N_PAGES}_s{SEED}")


def ensure_corpus() -> None:
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import distributed_pages

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(master="local[32]", app_name="pack-gen", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    distributed_pages(spark, N_PAGES, SEED).select("url", "text").write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.chunking import chunk_documents, pack_chunks
    from ontology_pipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]", app_name=f"pack-{cores}", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    chunks = chunk_documents(
        docs, id_col="url", chunk_tokens=128, overlap=16
    ).localCheckpoint(eager=True)
    n_chunks = chunks.count()
    out = {"cores": cores, "n_chunks": n_chunks, "sweep": {}}
    for mult in MULTIPLIERS:
        n_groups = mult * cores

        def job() -> None:
            pack_chunks(
                chunks, budget=512, id_cols=("url", "chunk_idx"), n_groups=n_groups
            ).agg(F.max("pack_fill"), F.count("*")).first()

        job()  # warm-up
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            job()
            times.append(round(time.perf_counter() - t0, 3))
        best = min(times)
        out["sweep"][str(n_groups)] = {
            "times": times,
            "best_sec": best,
            "chunks_per_sec": round(n_chunks / best, 1),
        }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    from bench_scaling import _hw_ceiling

    ensure_corpus()
    results = {}
    for cores in (8, 32):
        hw8, hw32 = _hw_ceiling()
        print(f"hw ceiling before local[{cores}]: {(hw8 / hw32) / 4:.3f}")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"worker local[{cores}] failed (rc={out.returncode})")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        print(line)
        results[cores] = json.loads(line)
    print("\n| n_groups/core | local[8] best | local[32] best | eff raw |")
    print("|---|---|---|---|")
    for mult in MULTIPLIERS:
        a = results[8]["sweep"][str(mult * 8)]["best_sec"]
        b = results[32]["sweep"][str(mult * 32)]["best_sec"]
        print(f"| {mult}x | {a} s | {b} s | {(a / b) / 4:.3f} |")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
