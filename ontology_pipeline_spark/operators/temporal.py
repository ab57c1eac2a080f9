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

    r = right.select(
        F.col(right_key).alias(key), right_ts, *[c for c in right_cols if c != right_ts]
    )
    out_fields = list(left.schema.fields) + [
        T.StructField(f.name, f.dataType, True)
        for f in r.schema.fields
        if f.name in right_cols
    ]
    schema = T.StructType(out_fields)
    left_cols = list(left.columns)
    attach = [c for c in right_cols]

    def merge(l: pd.DataFrame, r_: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=left_cols + attach)
        l = l.sort_values(left_ts, kind="mergesort")
        if r_.empty:
            out = l.copy()
            for c in attach:
                out[c] = None
            return out[left_cols + attach]
        r_ = r_.sort_values([right_ts] + tiebreak, kind="mergesort").drop(columns=[key])
        # merge_asof needs identical temporal dtypes on both 'on' columns
        unit = "datetime64[ns]"
        l = l.assign(_on=l[left_ts].astype(unit))
        r_ = r_.assign(_on=r_[right_ts].astype(unit))
        out = pd.merge_asof(l, r_, on="_on", direction="backward")
        return out[left_cols + attach]

    return (
        left.groupBy(key)
        .cogroup(r.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )
