"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable,
pure DataFrame expressions.

Engine extension (the reference computes only exact counts): a bottom-k
sketch over xxhash64 values estimates per-group distinct cardinality with
relative error ~ 1/sqrt(k-2), using O(k) state per group regardless of
cardinality.  Unlike approx_count_distinct's HLL, the sketch here is an
inspectable column (sorted hash array), deterministic across runs, and
mergeable with plain array expressions — union two sketches, keep the k
smallest — so rollups across partitions/days/tables compose without rescan.

Scale notes: the heavy step is one hash-aggregate per group keyed on the
group column (map-side partial via collect-free min-k: we pre-filter to the
k smallest hashes per group per partition with a window before the final
merge, so a hot group ships k values per map task, not its raw rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 output normalized into [0, 1): (h + 2^63) / 2^64.  The sketch
# keeps the RAW 64-bit hash as its dedup/sort/prune key — casting to double
# (53-bit mantissa) before dedup would collide distinct hashes within 2^11 of
# each other and deflate estimates at large cardinality; normalization happens
# only inside kmv_estimate, on the single kth value.
_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def _unit(col: Column) -> Column:
    """Normalize a raw 64-bit hash into [0, 1) (estimate-time only)."""
    return (col.cast("double") + F.lit(_TWO63)) / F.lit(_TWO64)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per group: the k smallest raw xxhash64 values of distinct values.

    Returns group_cols + `sketch` (sorted array<bigint>, length <= k).
    Signed-long order equals unit-interval order under the +2^63 shift, so
    sorting raw hashes and normalizing the kth at estimate time is exact.
    """
    hashed = (
        # COUNT(DISTINCT) semantics: NULL is not a value.  xxhash64(NULL)
        # returns the seed hash (never null), so without this filter every
        # NULL would enter the sketch as one phantom distinct value.
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.xxhash64(F.col(value_col)).alias("_h"))
        .dropDuplicates([*group_cols, "_h"])
    )
    # pre-prune to k per group before the final aggregation (bounded state
    # for hot groups; WindowGroupLimit pushes the rank filter below the
    # exchange, same mechanism as top-k dedup)
    w = Window.partitionBy(*group_cols).orderBy("_h")
    pruned = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    sk = pruned.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch")
    )
    # groups whose values are all NULL must still appear (with an empty
    # sketch -> estimate 0), matching GROUP BY + COUNT(DISTINCT)
    groups = df.select(*group_cols).distinct()
    return groups.join(sk, list(group_cols), "left").withColumn(
        "sketch", F.coalesce(F.col("sketch"), F.array().cast("array<bigint>"))
    )


def kmv_estimate(sketch_col: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a KMV sketch column: if the sketch is
    full, (k-1)/unit(kth_min); else the exact sketch size (all values seen)."""
    size = F.size(sketch_col)
    kth = _unit(F.element_at(sketch_col, k))
    return F.when(size < k, size.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / kth, 1)
    )


def kmv_merge(a: Column, b: Column, k: int = 64) -> Column:
    """Merge two sketches: union, dedup, keep the k smallest (array exprs)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def estimate_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """group_cols + est_distinct (double) via the KMV sketch."""
    return kmv_sketch(df, group_cols, value_col, k).select(
        *group_cols, kmv_estimate(F.col("sketch"), k).alias("est_distinct")
    )
