"""Training-prep operator throughput + scaling probe -> BENCH/training_prep.md.

The two-parallelism-level evidence pattern (bench_scaling.py / media_probe.py)
applied to the round-3 training-data-preparation operators over an
executor-generated page corpus (default 200k pages; override with
SPARK_GRAFT_PREP_N, filter chains with SPARK_GRAFT_PREP_CHAINS):

* chunk      — chunk_documents(text, 128 tokens, overlap 16), forced through
               an aggregate over n_tokens AND chunk_text so column pruning
               cannot skip the window/join work;
* chunk+pack — the same chunks greedily packed into 512-token bins
               (pack_chunks, hash-sharded groups = 4x cores);
* decontam   — contamination_hits against a pseudo-random 1/997 hash slice
               of the pages (pmod(xxhash64(url), 997) == 0) as the
               benchmark, the broadcast gram semi-join path.

Writes BENCH/training_prep_latest.md — the curated evidence in
BENCH/training_prep.md is hand-merged only (bench_scaling.py protocol).

Usage:
    python scripts/training_prep_probe.py              # full probe, writes md
    python scripts/training_prep_probe.py --worker 8   # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# executor python workers inherit the driver's PYTHONPATH env (not its
# sys.path): export REPO so mapInPandas stages can import the package no
# matter what cwd the probe was launched from
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

N_PAGES = int(os.environ.get("SPARK_GRAFT_PREP_N", "200000"))
SEED = 23
RUNS = 3
CORPUS = os.path.join(REPO, ".bench_data", f"prep_v1_n{N_PAGES}_s{SEED}")


def ensure_corpus() -> None:
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import distributed_pages

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(master="local[32]", app_name="prep-gen", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    distributed_pages(spark, N_PAGES, SEED).select("url", "text").write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.chunking import chunk_documents, pack_chunks
    from ontology_pipeline_spark.operators.decontaminate import (
        benchmark_ngrams,
        contamination_hits,
    )
    from ontology_pipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]", app_name=f"prep-{cores}", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    n_rows, n_bytes = docs.agg(F.count("*"), F.sum(F.length("text"))).first()

    def chunk_chain():
        return (
            chunk_documents(docs, id_col="url", chunk_tokens=128, overlap=16)
            .agg(F.sum("n_tokens"), F.sum(F.length("chunk_text")))
            .first()
        )

    def pack_chain():
        chunks = chunk_documents(docs, id_col="url", chunk_tokens=128, overlap=16)
        return (
            pack_chunks(
                chunks, budget=512, id_cols=("url", "chunk_idx"), n_groups=4 * cores
            )
            .agg(F.max("pack_fill"), F.count("*"))
            .first()
        )

    def decontam_chain():
        bench = docs.filter(F.pmod(F.xxhash64("url"), F.lit(997)) == 0).select("text")
        grams = benchmark_ngrams(bench, n=13)
        return contamination_hits(docs, grams, id_col="url", n=13).count()

    chains = {"chunk": chunk_chain, "chunk+pack": pack_chain, "decontam": decontam_chain}
    only = os.environ.get("SPARK_GRAFT_PREP_CHAINS")
    if only:
        want = {c.strip() for c in only.split(",")}
        chains = {k: v for k, v in chains.items() if k in want}
    out = {"cores": cores, "n_rows": int(n_rows), "mb": round(n_bytes / 1e6, 1), "chains": {}}
    for name, fn in chains.items():
        fn()  # warm-up
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        best = min(times)
        out["chains"][name] = {
            "times": times,
            "best_sec": best,
            "rows_per_sec": round(n_rows / best, 1),
            "mb_per_sec": round(n_bytes / 1e6 / best, 1),
        }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    from bench_scaling import _hw_ceiling

    ensure_corpus()
    results: dict[int, dict] = {}
    ceilings = []
    # interleave levels so each samples multiple throttle windows (see
    # media_probe.py); best-of-all-visits per chain estimates capacity
    for cores in (8, 32, 8, 32):
        hw8, hw32 = _hw_ceiling()
        ceilings.append((hw8 / hw32) / 4)
        print(f"hw ceiling sample before local[{cores}]: {ceilings[-1]:.3f}")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"worker local[{cores}] failed (rc={out.returncode})")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        got = json.loads(line)
        print(line)
        if cores not in results:
            results[cores] = got
        else:  # keep per-chain best across visits
            for name, c in got["chains"].items():
                prev = results[cores]["chains"][name]
                if c["best_sec"] < prev["best_sec"]:
                    results[cores]["chains"][name] = c
                prev_times = prev["times"]
                results[cores]["chains"][name]["times"] = prev_times + c["times"]
    ceiling = max(ceilings)
    r8, r32 = results[8], results[32]
    lines = [
        "# BENCH/training_prep_latest — probe run (hand-merge improvements into the curated training_prep.md)",
        "",
        f"Corpus: {r8['n_rows']} executor-generated pages ({r8['mb']} MB text), "
        f"seed {SEED}; two interleaved visits per level, best of {RUNS} per visit "
        "(media_probe protocol, hw-ceiling burn before each visit; "
        f"best same-window ceiling {ceiling:.3f}).",
        "",
        "| chain | local[8] best | rows/s | local[32] best | rows/s | eff raw | eff norm |",
        "|---|---|---|---|---|---|---|",
    ]
    names = [n for n in ("chunk", "chunk+pack", "decontam") if n in r8["chains"]]
    for name in names:
        a, b = r8["chains"][name], r32["chains"][name]
        eff = (a["best_sec"] / b["best_sec"]) / 4
        lines.append(
            f"| {name} | {a['best_sec']} s | {a['rows_per_sec']} | "
            f"{b['best_sec']} s | {b['rows_per_sec']} | {eff:.3f} | {eff / ceiling:.3f} |"
        )
    lines += [
        "",
        "Raw timings (s):",
    ]
    for name in names:
        lines.append(
            f"- {name}: local[8] {r8['chains'][name]['times']}, "
            f"local[32] {r32['chains'][name]['times']}"
        )
    path = os.path.join(REPO, "BENCH", "training_prep_latest.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
