"""Deterministic sampling operators for training-data curation.

Engine extensions (the reference has no sampling; a 100 TB corpus pipeline
needs it constantly): both operators are pure JVM expressions keyed on
xxhash64, so they are

* deterministic — the same row is selected on every run, every engine,
  every partitioning (unlike `df.sample`, whose output depends on the
  partition layout);
* CONSISTENT across tables — any table sharing the key column samples the
  same keys, so sampled fact/dim tables still join losslessly (the standard
  hash-threshold trick for subsampling joinable corpora);
* mergeable/resumable — a sample at rate r1 is a superset of rate r2 < r1,
  so widening a sample never redraws it.

Scale: `hash_sample` is a narrow filter (pushed into the scan's ReadSchema
world, no shuffle).  `stratified_hash_sample` is a per-group top-n by hash
rank; the row_number filter compiles to WindowGroupLimit, which pre-prunes
to n rows per group per map task BELOW the exchange — a hot group ships n
rows, not its raw stream (same mechanism as the KMV sketch prune).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _MERSENNE  # one shared modulus across all hash-rank ops


def _hash_rank(key: Column) -> Column:
    """Deterministic rank in [0, 2^31-1): pmod(xxhash64(cast(key AS string)), p).

    The cast-to-string is load-bearing for the cross-table consistency
    guarantee: Spark's xxhash64 is TYPE-sensitive (an INT 7 and a BIGINT 7
    hash differently), so two tables storing the shared key at different
    physical widths would otherwise sample different key sets and silently
    break the lossless-join property."""
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(_MERSENNE))


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep rows whose key hashes below `rate` of the hash space.

    E[f] = rate of DISTINCT keys kept (all rows of a kept key survive —
    group-preserving, unlike row-level Bernoulli sampling)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_hash_rank(F.col(key_col)) < int(rate * _MERSENNE))


def stratified_hash_sample(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    key_col: str,
) -> DataFrame:
    """Exactly n (or all, if fewer) rows per group: the n smallest
    (hash_rank(key), key) — a deterministic uniform draw per stratum with a
    total-order tie-break on the key itself."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_rank(F.col(key_col)), F.col(key_col)
    )
    # never clobber a caller column named _rn
    rn = "_rn"
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n_per_group)
        .drop(rn)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group hash-threshold sampling — the domain-mixture resampling step
    of a training-data pipeline (e.g. keep 100% of books, 30% of web, 5% of
    boilerplate).  `rates` maps group value -> keep rate in [0, 1]; groups
    absent from the map keep `default_rate` of their keys.

    Same guarantees as `hash_sample`, per group: deterministic,
    partition-invariant, group-preserving on the key, and superset-monotone
    in every rate (raising one group's rate only ADDS that group's rows, so
    re-mixing never redraws what was already selected).  The rate map is a
    literal `CASE WHEN` expression tree (bounded vocabulary — domains/langs/
    source labels), so the whole operator stays one narrow JVM filter with
    no shuffle and no join."""
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = F.lit(int(default_rate * _MERSENNE))
    for g, r in sorted(rates.items()):  # deterministic expression tree
        threshold = F.when(
            F.col(group_col) == F.lit(g), F.lit(int(r * _MERSENNE))
        ).otherwise(threshold)
    return df.filter(_hash_rank(F.col(key_col)) < threshold)
