"""Recall probe for embedding-pair blocking strategies — the evidence
behind BENCH/embedding_blocking.md.

Fixture (same as round 3's table): the sf0.1 embeddings table plus one
scaled + lightly-perturbed clone for every 10th vector (seeded).  Ground
truth at each threshold is UNBLOCKED brute force over the fixture; the
label-blocked column shows what a natural metadata key recovers (pairs
never cross labels for the clones, but mid-threshold raw pairs can).

Usage: python scripts/embedding_blocking_probe.py [sf_dir]
Prints one markdown table row per (threshold, method).
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_pipeline_spark.operators.dedup import (  # noqa: E402
    embedding_cosine_pairs,
    embedding_lsh_pairs,
    ivf_blocked_pairs,
)
from ontology_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = base.select("vec_id", "label", "embedding").collect()
    rng = random.Random(5)
    clones = []
    for r in rows:
        if r["vec_id"] % 10 == 0:
            v = [float(x) for x in r["embedding"]]
            pert = [x * 1.05 + rng.gauss(0.0, 0.002) for x in v]
            clones.append((r["vec_id"] + 1_000_000, r["label"], pert))
    fixture = spark.createDataFrame(
        [(r["vec_id"], r["label"], [float(x) for x in r["embedding"]]) for r in rows]
        + clones,
        "vec_id long, label string, embedding array<double>",
    ).localCheckpoint(eager=True)
    n = fixture.count()
    print(f"fixture: {n} vectors ({len(clones)} clones)\n")
    print("| threshold | method | pairs | true pairs hit | recall | wall s |")
    print("|---|---|---|---|---|---|")

    for t in (0.98, 0.35):
        truth = {
            (r["id_a"], r["id_b"])
            for r in embedding_cosine_pairs(fixture, threshold=t).collect()
        }
        methods = {
            "label-blocked": lambda: embedding_cosine_pairs(
                fixture, block_col="label", threshold=t
            ),
            "banded sign-LSH": lambda: embedding_lsh_pairs(fixture, threshold=t),
            "IVF-blocked (16c, assign 2)": lambda: ivf_blocked_pairs(
                fixture, threshold=t, n_centroids=16, n_assign=2
            ),
            "IVF-blocked (16c, assign 4)": lambda: ivf_blocked_pairs(
                fixture, threshold=t, n_centroids=16, n_assign=4
            ),
        }
        print(f"| {t} | exact brute force (truth) | {len(truth)} | — | 1.0 | — |")
        for name, thunk in methods.items():
            t0 = time.perf_counter()
            got = {(r["id_a"], r["id_b"]) for r in thunk().collect()}
            wall = time.perf_counter() - t0
            hit = len(got & truth)
            rec = hit / len(truth) if truth else 1.0
            print(f"| {t} | {name} | {len(got)} | {hit} | {rec:.4f} | {wall:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
