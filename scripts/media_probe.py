"""Multimodal decode throughput + scaling probe -> BENCH/multimodal_decode.md.

The same two-parallelism-level evidence pattern as bench_scaling.py, applied
to the round-3 decode path: generate a PNG corpus ON THE EXECUTORS
(synth.distributed_media), write it to parquet once, then time the full
decode -> resize -> stats chain (operators.multimodal.image_channel_stats,
the multimodal_media_stats query's image branch) at local[8] and local[32] in
separate subprocesses (a JVM cannot change masters).  Reports images/s and
payload MB/s at both levels plus scaling efficiency.

Usage:
    python scripts/media_probe.py              # full probe, writes the md
    python scripts/media_probe.py --worker 8   # one timed level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 400k images: compute-dominated (60k was task-overhead-dominated at ~2 s wall)
N_MEDIA = int(os.environ.get("SPARK_GRAFT_MEDIA_N", "400000"))
SEED = 19
RUNS = 3
CORPUS = os.path.join(REPO, ".bench_data", f"media_v1_n{N_MEDIA}_s{SEED}")


def ensure_corpus() -> None:
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import distributed_media

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(master="local[32]", app_name="media-gen", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    distributed_media(spark, N_MEDIA, SEED).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.multimodal import image_channel_stats
    from ontology_pipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]", app_name=f"media-{cores}", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    media = spark.read.parquet(CORPUS)
    n_bytes = media.agg(F.sum(F.length("payload"))).first()[0]

    def once() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = image_channel_stats(media).filter(F.col("format").isNotNull()).count()
        return time.perf_counter() - t0, n

    once()  # warm-up (codegen, Arrow workers)
    times, n_ok = [], 0
    for _ in range(RUNS):
        sec, n_ok = once()
        times.append(round(sec, 3))
    best = min(times)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_media": N_MEDIA,
                "decoded": n_ok,
                "payload_mb": round(n_bytes / 1e6, 1),
                "times": times,
                "best_sec": best,
                "images_per_sec": round(n_ok / best, 1),
                "mb_per_sec": round(n_bytes / 1e6 / best, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ensure_corpus()
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"worker local[{cores}] failed (rc={out.returncode})")
        json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not json_lines:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"worker local[{cores}] produced no result line")
        line = json_lines[-1]
        results[cores] = json.loads(line)
        print(line)
        # the evidence file claims every image decoded — assert it, so a
        # decoder regression can never write silently-wrong curated numbers
        if results[cores]["decoded"] != N_MEDIA:
            raise SystemExit(
                f"decode shortfall at local[{cores}]: "
                f"{results[cores]['decoded']}/{N_MEDIA} decoded"
            )
    r8, r32 = results[8], results[32]
    eff = (r32["images_per_sec"] / r8["images_per_sec"]) / 4
    print(f"eff(8->32)={eff:.3f}")
    md = os.path.join(REPO, "BENCH", "multimodal_decode.md")
    with open(md, "w") as f:
        f.write(
            "# BENCH/multimodal_decode — PNG decode->resize->stats throughput (round 3)\n\n"
            "Same two-parallelism-level protocol as the KG scaling evidence, applied\n"
            "to the real decode path: executor-generated PNG corpus (`synth.\n"
            "distributed_media`, driver holds nothing), parquet-cached, then the\n"
            "full `image_channel_stats` chain (pure-stdlib decode, all 5 filters,\n"
            "integer 4x4 block-average thumbnail, channel means) timed per level in\n"
            f"its own subprocess; best of {RUNS} after one warm-up run.\n\n"
            f"Corpus: {N_MEDIA} PNGs ({r8['payload_mb']} MB payloads; gray/GA/RGB/RGBA,\n"
            "5-24 px, filters cycling 0-4), every image decoded (format non-null).\n\n"
            "| run | master | best wall | images/s | payload MB/s |\n"
            "|---|---|---|---|---|\n"
            f"| N | `local[8]` | {r8['best_sec']} s | {r8['images_per_sec']} | {r8['mb_per_sec']} |\n"
            f"| 4N | `local[32]` | {r32['best_sec']} s | {r32['images_per_sec']} | {r32['mb_per_sec']} |\n\n"
            f"Scaling efficiency (images/s, 8->32): **{eff:.3f}** raw on a host whose\n"
            "pure-CPU 8->32 ceiling is ~0.64 (see BENCH/BASELINE.md hardware note).\n"
            "The stage is a narrow mapInPandas with no shuffle: per-split decode is\n"
            "embarrassingly parallel, so throughput tracks whatever CPU the VM\n"
            "grants — on a real cluster it scales with executors, and the decoder\n"
            "swaps to a C codec (libvips/Pillow-SIMD) without touching the plan.\n\n"
            f"Raw timings (s): local[8] {r8['times']}, local[32] {r32['times']}\n"
        )
    print(f"wrote {md}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
