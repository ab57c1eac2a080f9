"""As-of join: cogrouped merge_asof vs a window-based Spark formulation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.temporal import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_join_basic(spark):
    events = spark.createDataFrame(
        [
            (1, 10, _ts(5)),
            (2, 10, _ts(1)),   # before any order for user 10
            (3, 20, _ts(9)),
            (4, 30, _ts(9)),   # user with no orders at all
        ],
        ["event_id", "user_id", "ts"],
    )
    orders = spark.createDataFrame(
        [
            (100, 10, _ts(2), 5.0),
            (101, 10, _ts(4), 7.0),   # latest <= day 5
            (102, 10, _ts(6), 9.0),   # after the event
            (200, 20, _ts(9), 1.0),   # exactly at the event ts -> matches
            (201, 20, _ts(9), 2.0),   # same ts, larger key wins the tie
        ],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = asof_join(
        events,
        orders,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tiebreak=["o_orderkey"],
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["o_orderkey"] == 101 and rows[1]["o_totalprice"] == 7.0
    assert rows[2]["o_orderkey"] is None
    assert rows[3]["o_orderkey"] == 201  # tie on ts -> greatest key
    assert rows[4]["o_orderkey"] is None


def test_asof_join_matches_window_formulation(spark):
    """On real testdata the cogrouped merge_asof must equal the declarative
    range-join + row_number formulation (the O(n*m) reference semantics)."""
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    got = asof_join(
        events,
        orders,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tiebreak=["o_orderkey"],
    ).filter(F.col("o_orderkey").isNotNull()).select(
        "event_id", "user_id", "ts", "o_orderkey", "o_orderdate"
    )

    joined = events.join(
        orders, (events["user_id"] == orders["o_custkey"]) & (orders["o_orderdate"] <= events["ts"])
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    want = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(got) == as_set(want)
    assert got.count() > 0


def test_asof_join_same_ts_name_both_sides(spark):
    """The natural call shape: both sides name their timestamp 'ts' and only
    value columns are attached (regression: used to KeyError inside the
    pandas worker via merge-suffixing)."""
    left = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(1))], ["event_id", "sym", "ts"]
    )
    right = spark.createDataFrame(
        [("a", _ts(2), 10.0), ("a", _ts(4), 20.0)], ["sym", "ts", "price"]
    )
    out = asof_join(left, right, key="sym", right_cols=["price"])
    rows = {r["event_id"]: r["price"] for r in out.collect()}
    assert rows == {1: 20.0, 2: None}


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([(1, _ts(1))], ["k", "ts"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, key="k", right_cols=["ts"])


def test_asof_join_rejects_unknown_tiebreak(spark):
    """ADVICE r1: a tiebreak column absent from right_cols must raise a
    descriptive driver-side ValueError, not an executor KeyError."""
    left = spark.createDataFrame([(1, "a", _ts(5))], ["event_id", "sym", "ts"])
    right = spark.createDataFrame([("a", _ts(2), 10.0)], ["sym", "ts", "price"])
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(left, right, key="sym", right_cols=["price"], tiebreak=["nope"])


def test_asof_join_null_timestamps_degrade_per_row(spark):
    """ADVICE r1: null timestamps on either side must not crash the cogrouped
    stage — null-right rows are dropped (can't be 'latest at or before'),
    null-left rows come through with null attach columns."""
    left = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", None), (3, "b", None)],
        "event_id int, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(2), 10.0), ("a", None, 99.0), ("b", None, 77.0)],
        "sym string, ts timestamp, price double",
    )
    out = asof_join(left, right, key="sym", right_cols=["price"])
    rows = {r["event_id"]: r["price"] for r in out.collect()}
    assert rows == {1: 10.0, 2: None, 3: None}


def test_bucketized_range_join_drops_inverted_intervals(spark):
    """ADVICE r1: an inverted interval (end < start) must not explode a
    descending bucket sequence (job-killer at wide inversions); it matches
    nothing and is dropped up front."""
    from ontology_pipeline_spark.operators.temporal import bucketized_range_join

    points = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 3))], ["pid", "pt"]
    )
    intervals = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 5)),  # valid
            (1, dt.datetime(2030, 1, 1), dt.datetime(2024, 1, 1)),  # wide inversion
        ],
        ["iid", "start", "end"],
    )
    got = bucketized_range_join(
        points, intervals, "pt", "start", "end", bucket_seconds=86400
    ).select("pid", "iid")
    assert {tuple(r) for r in got.collect()} == {(0, 0)}


def test_bucketized_range_join_matches_theta_join(spark):
    """Bucketized equi-join formulation must equal the naive theta join,
    including intervals spanning many buckets and boundary points
    (start inclusive, end exclusive)."""
    from ontology_pipeline_spark.operators.temporal import bucketized_range_join

    points = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=7 * i)) for i in range(60)],
        ["pid", "pt"],
    )
    intervals = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 5)),
            (1, dt.datetime(2024, 1, 4, 12), dt.datetime(2024, 1, 4, 19)),
            (2, dt.datetime(2023, 12, 1), dt.datetime(2024, 2, 1)),  # spans all
            (3, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 7)),  # [p0, p1)
            (4, dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)),  # matches none
        ],
        ["iid", "start", "end"],
    )
    got = bucketized_range_join(
        points, intervals, "pt", "start", "end", bucket_seconds=86400
    ).select("pid", "iid")
    want = points.join(
        intervals,
        (points["pt"] >= intervals["start"]) & (points["pt"] < intervals["end"]),
    ).select("pid", "iid")
    as_set = lambda df: {tuple(r) for r in df.collect()}
    g, w = as_set(got), as_set(want)
    assert g == w
    assert (0, 3) in g and (1, 3) not in g  # end-exclusive boundary
    assert all(i != 4 for _, i in g)
