"""Temporal join operators — as-of (point-in-time) join.

Engine extension (the reference has no temporal joins — SURVEY.md §2.6 lists
as-of joins as absent); included because a training-data/KG pipeline joining
event streams to slowly-changing reference data needs point-in-time
semantics, and Spark's built-in join types cannot express "latest right row
at or before the left timestamp" without a quadratic range join.

Implementation: cogrouped `applyInPandas` + `pandas.merge_asof` per key
group — the canonical Spark pattern for custom binary operators:

* both sides shuffle ONCE on the equi-key (same as any join);
* within a key group the match is a sorted merge (O(n log n) for the sort,
  O(n) for the merge) instead of the O(n*m) filter+window formulation;
* Arrow-batched both directions, no per-row Python.

Determinism: right rows are sorted by (right_ts, *tiebreak) before the
merge, and `merge_asof` takes the LAST row at or before the left timestamp,
so ties on right_ts resolve to the greatest tiebreak value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same key (backward as-of). Left rows with no
    prior right row keep nulls in the attached columns.

    `right_cols` are the right-side columns to attach (default: all except
    the key); they must not collide with left column names.
    """
    right_key = right_key or key
    if right_cols is None:
        right_cols = [c for c in right.columns if c != right_key]
    tiebreak = tiebreak or []
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    # validate on the DRIVER: a tiebreak column absent from the pandas frame
    # would otherwise surface as an opaque KeyError deep inside the executor
    missing_tb = set(tiebreak) - (set(right_cols) | {right_ts})
    if missing_tb:
        raise ValueError(
            f"tiebreak columns must be in right_cols (or be right_ts): "
            f"missing {sorted(missing_tb)}"
        )

    # the right timestamp travels under a private name so that the common
    # call shape left_ts == right_ts (both sides named "ts") never collides
    # inside the pandas merge; it is exposed in the output only when the
    # caller lists right_ts in right_cols (clash guard above then ensures the
    # name is free on the left)
    r = right.select(
        F.col(right_key).alias(key),
        F.col(right_ts).alias("_rts"),
        *[c for c in right_cols if c != right_ts],
    )
    expose_rts = right_ts in right_cols
    right_field_types = {f.name: f.dataType for f in right.schema.fields}
    out_fields = list(left.schema.fields) + [
        T.StructField(c, right_field_types[c], True) for c in right_cols
    ]
    schema = T.StructType(out_fields)
    left_cols = list(left.columns)
    attach = list(right_cols)

    def _null_attach(frame: pd.DataFrame) -> pd.DataFrame:
        out = frame.copy()
        for c in attach:
            out[c] = None
        return out[left_cols + attach]

    def merge(l: pd.DataFrame, r_: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=left_cols + attach)
        # null timestamps would make merge_asof raise (NaT sorts last, then
        # pandas rejects null/unsorted merge keys) and fail the whole stage;
        # degrade per-row instead: null-right rows can never be "latest at or
        # before" (drop), null-left rows match nothing (emit null attach)
        null_l = l[l[left_ts].isna()]
        l = l[l[left_ts].notna()]
        r_ = r_[r_["_rts"].notna()]
        if l.empty:
            return _null_attach(null_l)
        l = l.sort_values(left_ts, kind="mergesort")
        if r_.empty:
            out = _null_attach(l)
            if not null_l.empty:
                out = pd.concat([out, _null_attach(null_l)], ignore_index=True)
            return out
        sort_keys = ["_rts"] + [c for c in tiebreak if c != right_ts]
        r_ = r_.sort_values(sort_keys, kind="mergesort").drop(columns=[key])
        # merge_asof needs identical temporal dtypes on both 'on' columns
        unit = "datetime64[ns]"
        l = l.assign(_on=l[left_ts].astype(unit))
        r_ = r_.assign(_on=r_["_rts"].astype(unit))
        if not expose_rts:
            r_ = r_.drop(columns=["_rts"])
        out = pd.merge_asof(l, r_, on="_on", direction="backward")
        if expose_rts:
            out = out.rename(columns={"_rts": right_ts})
        out = out[left_cols + attach]
        if not null_l.empty:
            out = pd.concat([out, _null_attach(null_l)], ignore_index=True)
        return out

    return (
        left.groupBy(key)
        .cogroup(r.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )


_EPOCH0 = "1970-01-01 00:00:00"


def _secs(col):
    """Seconds since epoch for timestamp/timestamp_ntz columns (timestamp_ntz
    cannot be cast to long directly)."""
    return F.timestamp_diff("SECOND", F.lit(_EPOCH0).cast("timestamp_ntz"), col.cast("timestamp_ntz"))


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Point-in-interval join (start <= point < end) via time bucketing.

    A naive range join is a theta join — Spark executes it as a broadcast
    nested loop (O(points x intervals)).  Bucketizing turns it into an
    EQUI-join: each point lands in exactly one `bucket_seconds`-wide bucket,
    each interval is exploded across the buckets it overlaps (`sequence` +
    `explode`, JVM-side), the join runs hash-partitioned on the bucket, and
    the exact predicate filters residual false pairs inside the bucket.
    Because a point has exactly one bucket, no pair can match twice — no
    dedup needed.  Shuffle volume scales with points + interval-bucket
    expansions; pick `bucket_seconds` near the typical interval length so
    each interval explodes to O(1) buckets.

    Returns points columns + intervals columns (names must not collide).
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    w = F.lit(int(bucket_seconds)).cast("long")
    p = points.withColumn("_b", F.floor(_secs(F.col(point_col)) / w))
    # an inverted interval (end < start, corrupt data) would make F.sequence
    # step -1 and generate a huge descending bucket range — potentially
    # millions of rows or a sequence-length-cap job failure.  Such rows can
    # never satisfy the exact predicate below, so drop them up front.
    intervals = intervals.filter(F.col(start_col) <= F.col(end_col))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_secs(F.col(start_col)) / w),
                F.floor(_secs(F.col(end_col)) / w),
            )
        ),
    )
    joined = p.join(iv, "_b").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_b")
