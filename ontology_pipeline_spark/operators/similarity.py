"""Similarity search over embedding columns (`array<float>`).

Engine extension for training-data pipelines: approximate-nearest-neighbor
over an embeddings table.

* `cosine_topk` — exact brute-force baseline: one narrow pass computing the
  dot product with a broadcast query vector (JVM `aggregate`/`zip_with`
  expressions, no Python), then a top-k.  At 100 TB this is a full scan but
  zero shuffle (top-k is a tree-aggregated `orderBy ... limit`).
* `lsh_ann` — the scale path: random-hyperplane (sign-LSH) bucketing; the
  query probes only its own bucket(s), so the scan is pruned by the bucket
  predicate (partition the table by bucket to make this partition pruning).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_scores(
    embeddings: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    score_col: str = "cosine",
    ndigits: int = 6,
) -> DataFrame:
    """Attach cosine(query, vec) — the brute-force kernel (rounded for
    cross-engine reproducibility)."""
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return embeddings.withColumn(score_col, F.round(cos, ndigits))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, deterministic tie-break on id."""
    return (
        cosine_scores(embeddings, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bits = bits.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return bits


def with_lsh_bucket(
    embeddings: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each vector its sign-LSH bucket (write-partition by this column
    for ANN partition pruning at scale)."""
    return embeddings.withColumn(
        bucket_col, _bucket_expr(F.col(vec_col).cast("array<double>"), planes)
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    `max_hamming` bit flips (multi-probe), then exact cosine inside.

    Approximate: recall < 1 by design; the candidate set shrinks the scan by
    ~2^n_planes / (multi-probe count)."""
    from itertools import combinations

    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if d >= 0:
            qbits |= 1 << i
    probe = [qbits]
    for h in range(1, max_hamming + 1):
        for bits in combinations(range(n_planes), h):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe.append(qbits ^ flip)

    bucketed = with_lsh_bucket(embeddings, planes, vec_col)
    cands = bucketed.filter(F.col("bucket").isin(probe))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)
