"""Multimodal decode throughput + scaling probe -> BENCH/multimodal_decode.md.

The same two-parallelism-level evidence pattern as bench_scaling.py, applied
to the real decode paths: generate a MIXED media corpus ON THE EXECUTORS
(synth.distributed_media, kinds cycling image/audio/video), write it to
parquet once, then time each decode chain over its kind-filtered subset —
image: operators.multimodal.image_channel_stats (decode -> 4x4 thumbnail ->
stats, the multimodal_media_stats query's image branch); audio: audio_stats
(RIFF walk -> integer-exact PCM stats); video: video_stats (Y4M plane walk
-> luma stats) — at local[8] and local[32] in separate subprocesses (a JVM
cannot change masters).  Reports rows/s and payload MB/s per kind at both
levels plus scaling efficiency.

Usage:
    python scripts/media_probe.py                 # full probe, writes the md
    python scripts/media_probe.py --worker 8      # one timed level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 3*133334 rows: ~400k images-equivalent compute at the image third; audio
# and video decode are cheaper per row so their thirds stay sub-minute
N_MEDIA = int(os.environ.get("SPARK_GRAFT_MEDIA_N", "400002"))
SEED = 19
RUNS = 3
KINDS = ("image", "audio", "video")
# v3: content selectors use the per-kind ordinal (v2 corpora collapsed each
# kind to a single label/waveform/motion when kinds cycled)
CORPUS = os.path.join(REPO, ".bench_data", f"media_v3_n{N_MEDIA}_s{SEED}")


def ensure_corpus() -> None:
    from ontology_pipeline_spark.session import get_spark
    from ontology_pipeline_spark.synth import distributed_media

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(master="local[32]", app_name="media-gen", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    distributed_media(spark, N_MEDIA, SEED, kinds=KINDS).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.multimodal import (
        audio_stats,
        image_channel_stats,
        video_stats,
    )
    from ontology_pipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]", app_name=f"media-{cores}", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    media = spark.read.parquet(CORPUS)
    chains = {
        "image": lambda df: image_channel_stats(df),
        "audio": lambda df: audio_stats(df),
        "video": lambda df: video_stats(df),
    }
    out = {"cores": cores, "kinds": {}}
    for kind, chain in chains.items():
        subset = media.filter(F.col("kind") == kind)
        n_rows, n_bytes = subset.agg(
            F.count("*"), F.sum(F.length("payload"))
        ).first()

        def once() -> tuple[float, int]:
            t0 = time.perf_counter()
            n = chain(subset).filter(F.col("format").isNotNull()).count()
            return time.perf_counter() - t0, n

        once()  # warm-up (codegen, Arrow workers)
        times, n_ok = [], 0
        for _ in range(RUNS):
            sec, n_ok = once()
            times.append(round(sec, 3))
        best = min(times)
        out["kinds"][kind] = {
            "n_rows": n_rows,
            "decoded": n_ok,
            "payload_mb": round(n_bytes / 1e6, 1),
            "times": times,
            "best_sec": best,
            "rows_per_sec": round(n_ok / best, 1),
            "mb_per_sec": round(n_bytes / 1e6 / best, 1),
        }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    # the ONE ceiling-measurement protocol: a calibration change there must
    # keep normalizing this probe identically
    from bench_scaling import _hw_ceiling

    ensure_corpus()
    # ALTERNATE the levels twice: this host's sustained-load throttling
    # shifts between minutes-apart windows, so a single 8-then-32 sequence
    # can time the two levels in different throttle states (observed:
    # local[32] slower than local[8]).  Interleaving gives each level a
    # sample of each window; per-kind best-of-all estimates capacity.
    # A hw-ceiling burn BEFORE EACH VISIT records what the VM was actually
    # granting around that measurement; the best ceiling across visits
    # normalizes the job's raw efficiency (bench_scaling.py protocol).
    results: dict[int, dict] = {}
    ceilings = []
    for cores in (8, 32, 8, 32):
        hw8, hw32 = _hw_ceiling()
        ceilings.append((hw8 / hw32) / 4)
        print(f"hw ceiling sample before local[{cores}]: {ceilings[-1]:.3f}")
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
        got = json.loads(line)
        print(line)
        # the evidence file claims every row decoded — assert it, so a
        # decoder regression can never write silently-wrong curated numbers
        for kind, r in got["kinds"].items():
            if r["decoded"] != r["n_rows"]:
                raise SystemExit(
                    f"decode shortfall at local[{cores}] {kind}: "
                    f"{r['decoded']}/{r['n_rows']} decoded"
                )
        if cores not in results:
            results[cores] = got
        else:  # merge: keep each kind's best level-capacity estimate
            for kind, r in got["kinds"].items():
                prev = results[cores]["kinds"][kind]
                prev["times"] = prev["times"] + r["times"]
                if r["best_sec"] < prev["best_sec"]:
                    prev.update(
                        {k: r[k] for k in ("best_sec", "rows_per_sec", "mb_per_sec")}
                    )
    r8, r32 = results[8]["kinds"], results[32]["kinds"]
    ceiling = max(ceilings)
    effs = {
        k: (r32[k]["rows_per_sec"] / r8[k]["rows_per_sec"]) / 4 for k in KINDS
    }
    for k, e in effs.items():
        print(f"eff(8->32, {k})={e:.3f} raw, {e / ceiling:.3f} normalized")
    print(f"hw ceiling (best of visits): {ceiling:.3f}, samples {ceilings}")
    md = os.path.join(REPO, "BENCH", "multimodal_decode.md")
    rows_md = "".join(
        f"| {k} | {r8[k]['n_rows']} | {r8[k]['payload_mb']} MB "
        f"| {r8[k]['best_sec']} s | {r8[k]['rows_per_sec']} "
        f"| {r32[k]['best_sec']} s | {r32[k]['rows_per_sec']} "
        f"| {effs[k]:.3f} | {effs[k] / ceiling:.3f} |\n"
        for k in KINDS
    )
    raw_md = "".join(
        f"- {k}: local[8] {r8[k]['times']}, local[32] {r32[k]['times']}\n"
        for k in KINDS
    )
    with open(md, "w") as f:
        f.write(
            "# BENCH/multimodal_decode — decode->stats throughput, all three media kinds (round 3)\n\n"
            "Same two-parallelism-level protocol as the KG scaling evidence, applied\n"
            "to every real decode path: executor-generated mixed corpus (`synth.\n"
            "distributed_media`, kinds cycling image/audio/video, driver holds\n"
            "nothing), parquet-cached, then each chain — `image_channel_stats`\n"
            "(pure-stdlib PNG decode, all 5 filters, integer 4x4 block-average\n"
            "thumbnail), `audio_stats` (RIFF walk, integer-exact PCM stats),\n"
            "`video_stats` (Y4M plane walk, luma stats) — timed over its\n"
            f"kind-filtered subset per level in its own subprocess; best of {RUNS}\n"
            "after one warm-up run.  Every row decoded (asserted), so the numbers\n"
            "measure the real-work path, never the NULL fast path.\n\n"
            "| kind | rows | payload | local[8] best | rows/s | local[32] best | rows/s | eff raw | eff normalized |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
            + rows_md
            + f"\nNormalization: a pure-CPU multiprocessing burn (bench_scaling.py's\n"
            f"`_hw_ceiling`) run before every visit measured this VM granting at\n"
            f"best **{ceiling:.3f}** of ideal 8->32 scaling during this probe\n"
            f"(samples per visit: {[round(c, 3) for c in ceilings]}); normalized\n"
            "efficiency = raw / that measured ceiling — what the same job would\n"
            "show on hardware that actually delivers 4x the CPU.\n"
            "Each stage is a narrow mapInPandas with no shuffle:\n"
            "per-split decode is embarrassingly parallel, so throughput tracks\n"
            "whatever CPU the VM grants — on a real cluster it scales with\n"
            "executors, and each decoder swaps to a C codec (libvips /\n"
            "Pillow-SIMD / libsndfile / ffmpeg) without touching the plan.\n\n"
            "Reading the rows: the image chain is the COMPUTE-bound case\n"
            "(pure-Python pixel decode) and tracks the granted CPU most\n"
            "closely; audio and, above all, video are BANDWIDTH-bound (the\n"
            "decoded payload streams at 0.5-1 GB/s at local[32]), so extra\n"
            "threads on ONE box fight for the same memory bus and their\n"
            "single-node thread-scaling tops out lower — a per-node resource\n"
            "bound, not a plan bottleneck.  On a multi-executor cluster each\n"
            "node brings its own memory bus and disks and the stage (narrow,\n"
            "no shuffle) scales with node count; the numbers to carry forward\n"
            "are the per-node throughputs above.\n\n"
            "Raw timings (s):\n" + raw_md
        )
    print(f"wrote {md}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
