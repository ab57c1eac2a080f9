"""Incremental-ingest scale probe -> BENCH/ingest_latest.md.

Measures the architectural claim behind plans/ingest.py (the daily-ingest
workflow): curating a new shard against PERSISTED dedup state costs
O(shard) — independent of how much history has been ingested — because the
historical corpus TEXT is never re-read (only the slim fingerprint table
and the (band, bucket) MinHash index are joined).  The batch alternative
(curate_documents over history + shard) re-gates, re-fingerprints and
re-shingles the ENTIRE corpus every day.

Probe design (all walls measured in the same session/window so ratios are
robust to host throttling, like bench_scaling.py's interleave protocol):

1. history-large = 500k executor-generated pages (seed 101);
   history-small = the pmod(doc_id, 4) == 0 quarter (~125k) of the SAME
   corpus, so the duplicate-injection below is present in both states.
2. shard = 125k fresh pages (seed 202) + ~5% exact duplicates and ~3%
   near-duplicates (one appended token, 2-shingle Jaccard ~0.99) drawn
   from history-small: every injected duplicate must be dropped by the
   EXACT anti-join / cross-shard MinHash probe in either state.
3. one-time state builds (ingest history as its own first shard), then the
   SAME shard ingested against a fresh copy of each state (best of
   RUNS; the state copy happens outside the timed window).
   KEY RATIO: wall(shard vs 500k state) / wall(shard vs 125k state) ~ 1.
4. batch baseline: curate_documents(history-large UNION shard) — what a
   user without persisted state pays per day.
   KEY RATIO: batch / incremental >> 1 and grows with history size.

Writes BENCH/ingest_latest.md; the curated evidence in BENCH/ingest.md is
hand-merged only (same discipline as bench_scaling.py -> BASELINE.md).

Probe history: the first run of this probe at 500k exposed that the
UNCAPPED minhash_probe_near_dups grew linearly with the index (105M
candidate rows vs the large state, 26M vs its quarter — template-family
buckets of up to 7.6k members at p99.9 occupancy 28), which is why the
probe path now carries the same hot-bucket cap as the batch LSH join and
ingest_shard threads max_bucket_size through to it.

Usage:
    python scripts/ingest_probe.py
    SPARK_GRAFT_INGEST_N=100000 python scripts/ingest_probe.py   # smaller
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

HIST_N = int(os.environ.get("SPARK_GRAFT_INGEST_N", "500000"))
SHARD_N = HIST_N // 4
RUNS = 2
DATA = os.path.join(REPO, ".bench_data", f"ingest_v2_n{HIST_N}")
OUT = os.path.join(REPO, "BENCH", "ingest_latest.md")


def ensure_data(spark) -> None:
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.synth import distributed_pages

    if os.path.exists(os.path.join(DATA, "shard", "_SUCCESS")):
        return

    def diversify(df):
        # The template-bank pages are far more self-similar than real web
        # text (2-shingle Jaccard ~0.9 between same-template pages): at
        # 125k docs the raw corpus produces 133M LSH candidate pairs (max
        # band-bucket occupancy 3363 — measured), which benchmarks the
        # pathological-corpus regime, not the ingest path.  Appending 24
        # per-doc unique tokens (3 x md5 split into 4-char tokens) drops
        # same-template Jaccard below the banding floor, so candidates come
        # from the INJECTED duplicates — the realistic few-percent regime.
        salt = [
            F.regexp_replace(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(s))), "(....)", "$1 ")
            for s in ("", "b", "c")
        ]
        return df.select("doc_id", F.concat(F.col("text"), F.lit(" "), *salt).alias("text"))

    hist = diversify(
        distributed_pages(spark, HIST_N, seed=101)
        .select(F.xxhash64("url").alias("doc_id"), "text")
    )
    hist.write.mode("overwrite").parquet(os.path.join(DATA, "hist_large"))
    hist_large = spark.read.parquet(os.path.join(DATA, "hist_large"))
    hist_small = hist_large.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    hist_small.write.mode("overwrite").parquet(os.path.join(DATA, "hist_small"))
    hist_small = spark.read.parquet(os.path.join(DATA, "hist_small"))

    fresh = diversify(
        distributed_pages(spark, SHARD_N, seed=202)
        .select(F.xxhash64(F.concat(F.col("url"), F.lit("#s"))).alias("doc_id"), "text")
    )
    exact_dups = hist_small.filter(
        F.pmod(F.xxhash64(F.col("doc_id") + F.lit(1)), F.lit(100)) < 5
    ).select(
        F.xxhash64(F.concat(F.col("doc_id").cast("string"), F.lit("#edup"))).alias("doc_id"),
        "text",
    )
    near_dups = hist_small.filter(
        F.pmod(F.xxhash64(F.col("doc_id") + F.lit(2)), F.lit(100)) < 3
    ).select(
        F.xxhash64(F.concat(F.col("doc_id").cast("string"), F.lit("#ndup"))).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" probefootertoken")).alias("text"),
    )
    fresh.unionByName(exact_dups).unionByName(near_dups).write.mode(
        "overwrite"
    ).parquet(os.path.join(DATA, "shard"))


def timed_ingest(spark, shard_df, state_dir: str, shard_id: str) -> tuple[float, dict]:
    from ontology_pipeline_spark.plans.ingest import ParquetStateStore, ingest_shard

    t0 = time.monotonic()
    res = ingest_shard(spark, shard_df, store=ParquetStateStore(state_dir), shard_id=shard_id)
    return time.monotonic() - t0, res


def main() -> None:
    from ontology_pipeline_spark.plans.curate import curate_documents
    from ontology_pipeline_spark.session import get_spark

    # localCheckpoint frames pin executor memory for the session's lifetime,
    # so every timed phase gets its OWN session (startup excluded from the
    # timed windows): phases are memory-isolated exactly like one-ingest-per-
    # driver production runs, and no phase runs GC-starved by its
    # predecessors.  48g heap: the 635k-doc batch baseline OOMs at the 8g
    # default with the accumulated checkpoints of a shared session.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    session = [None]

    def fresh():
        if session[0] is not None:
            session[0].stop()
        session[0] = get_spark(
            master="local[32]", app_name="ingest-probe", shuffle_partitions=32
        )
        session[0].sparkContext.setLogLevel("ERROR")
        return session[0]

    spark = fresh()
    ensure_data(spark)
    n_large = spark.read.parquet(os.path.join(DATA, "hist_large")).count()
    n_small = spark.read.parquet(os.path.join(DATA, "hist_small")).count()
    n_shard = spark.read.parquet(os.path.join(DATA, "shard")).count()
    print(f"hist_large={n_large} hist_small={n_small} shard={n_shard}")

    builds = {}
    for name in ("small", "large"):
        state = os.path.join(DATA, f"state_{name}")
        if not os.path.exists(os.path.join(state, "lineage")):
            spark = fresh()
            hist = spark.read.parquet(os.path.join(DATA, f"hist_{name}"))
            w, res = timed_ingest(spark, hist, state, "history")
            builds[name] = (w, res)
            print(f"state build {name}: {w:.1f} s {res}")
        else:
            builds[name] = (None, None)
            print(f"state build {name}: cached")

    # interleave small/large reps so the two states sample the same host
    # windows (the ratio protocol from bench_scaling.py)
    ingests = {name: [] for name in ("small", "large")}
    results = {}
    for rep in range(RUNS):
        for name in ("small", "large"):
            state = os.path.join(DATA, f"state_{name}")
            work = os.path.join(DATA, f"work_{name}_{rep}")
            if os.path.exists(work):
                shutil.rmtree(work)
            shutil.copytree(state, work)  # outside the timed window
            spark = fresh()
            shard = spark.read.parquet(os.path.join(DATA, "shard"))
            w, res = timed_ingest(spark, shard, work, "day_001")
            ingests[name].append(w)
            results[name] = res
            print(f"shard ingest vs {name} state rep{rep}: {w:.2f} s {res}")
            shutil.rmtree(work)
    ingests = {
        name: (min(walls), walls, results[name]) for name, walls in ingests.items()
    }

    spark = fresh()
    hist_large = spark.read.parquet(os.path.join(DATA, "hist_large"))
    shard = spark.read.parquet(os.path.join(DATA, "shard"))
    t0 = time.monotonic()
    n_batch = curate_documents(
        hist_large.unionByName(shard), "text", "doc_id"
    ).count()
    batch_wall = time.monotonic() - t0
    print(f"batch curate over {n_large + n_shard}: {batch_wall:.1f} s, {n_batch} survivors")

    small_w, large_w = ingests["small"][0], ingests["large"][0]
    ratio_hist = large_w / small_w
    speedup = batch_wall / large_w
    lines = [
        "# BENCH/ingest_latest — incremental ingest probe (hand-merge into BENCH/ingest.md)",
        "",
        f"Corpus: history {n_large} docs (small state = its {n_small}-doc quarter);",
        f"shard {n_shard} docs = {SHARD_N} fresh + ~5% exact + ~3% near duplicates",
        "injected from the SMALL history (present in both states — both must drop",
        "them via the fingerprint anti-join / cross-shard MinHash probe).",
        f"local[32], best of {RUNS}; one fresh Spark session per timed phase",
        "(localCheckpoint pins die with the session, so no phase runs",
        "GC-starved by its predecessors); small/large reps interleaved so the",
        "two states sample the same host windows (ratio protocol); the state",
        "copy happens outside the timed window.",
        "",
        "| phase | wall | counters |",
        "|---|---|---|",
    ]
    for name, n in (("small", n_small), ("large", n_large)):
        w, res = builds[name]
        wtxt = f"{w:.1f} s" if w is not None else "(cached)"
        lines.append(f"| one-time state build, {n}-doc history | {wtxt} | {res} |")
    for name in ("small", "large"):
        best, walls, res = ingests[name]
        lines.append(
            f"| shard ingest vs {name} state | **{best:.2f} s** "
            f"(runs: {', '.join(f'{w:.2f}' for w in walls)}) | {res} |"
        )
    lines += [
        f"| batch curate_documents(history+shard), {n_large + n_shard} docs | "
        f"{batch_wall:.1f} s | {n_batch} survivors |",
        "",
        f"**History-size independence**: shard-vs-large / shard-vs-small wall = "
        f"**{ratio_hist:.2f}** (4x the history, ~same cost — the history TEXT is "
        "never re-read; only the slim fingerprint/index tables are joined).",
        f"**Incremental vs batch**: batch re-curation costs **{speedup:.1f}x** the "
        "shard ingest at this scale, and the gap grows linearly with history "
        "size while the ingest wall stays flat.",
        "",
        "At 100 TB: the state tables are (fp)- and (band, bucket)-partitioned/",
        "bucketed, so the anti-join and probe become co-located pruned lookups;",
        "see plans/ingest.py scale notes.",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
