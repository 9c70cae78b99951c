"""Temporal join/rollup operators: as-of join (backward/forward/
tolerance), bin-bucketed range join vs a naive join, and hierarchical
rollup reaggregation exactness."""

import pytest
from pyspark.sql import functions as F

from kineo_spark.pipeline import temporal


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, "A", "2024-01-01 10:00:05", 100.0),
        (2, "A", "2024-01-01 10:01:30", 101.0),
        (3, "B", "2024-01-01 10:00:10", 50.0),
        (4, "C", "2024-01-01 10:00:00", 7.0),   # no quotes for C
    ]
    df = spark.createDataFrame(rows, "trade_id long, sym string, ts string, px double")
    return df.withColumn("ts", F.to_timestamp("ts"))


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", "2024-01-01 09:59:59", 99.5),
        ("A", "2024-01-01 10:00:05", 99.9),   # same instant as trade 1
        ("A", "2024-01-01 10:01:00", 100.5),
        ("A", "2024-01-01 10:02:00", 101.5),  # after trade 2
        ("B", "2024-01-01 10:00:20", 49.0),   # only after trade 3
    ]
    df = spark.createDataFrame(rows, "sym string, ts string, bid double")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_asof_backward(spark, trades, quotes):
    out = temporal.asof_join(trades, quotes, on="sym").collect()
    m = {r.trade_id: r.bid for r in out}
    assert m[1] == 99.9    # same-instant quote is visible
    assert m[2] == 100.5   # latest prior, not the later 101.5
    assert m[3] is None    # B has no quote at/before 10:00:10
    assert m[4] is None    # C has no quotes at all
    assert len(out) == 4   # left-join semantics: every trade survives


def test_asof_forward_and_tolerance(spark, trades, quotes):
    fwd = temporal.asof_join(trades, quotes, on="sym", direction="forward")
    m = {r.trade_id: r.bid for r in fwd.collect()}
    assert m[1] == 99.9    # same instant
    assert m[2] == 101.5   # earliest at/after 10:01:30
    assert m[3] == 49.0    # B's quote 10s later
    assert m[4] is None

    tol = temporal.asof_join(trades, quotes, on="sym", tolerance_s=30)
    m = {r.trade_id: r.bid for r in tol.collect()}
    assert m[1] == 99.9    # delta 0s
    assert m[2] == 100.5   # delta 30s, inside
    strict = temporal.asof_join(trades, quotes, on="sym", tolerance_s=10)
    m2 = {r.trade_id: r.bid for r in strict.collect()}
    assert m2[2] is None   # delta 30s > 10s → unmatched


def test_range_join_equals_naive(spark, trades, quotes):
    got = temporal.range_join(
        trades, quotes, on="sym", before_s=60, after_s=0, bin_s=45
    )
    got_pairs = sorted((r.trade_id, r.bid) for r in got.collect())
    naive = (
        trades.alias("t").join(
            quotes.select("sym", F.col("ts").alias("qts"), "bid").alias("q"),
            (F.col("t.sym") == F.col("q.sym"))
            & (F.col("qts") >= F.col("t.ts") - F.expr("INTERVAL 60 SECONDS"))
            & (F.col("qts") <= F.col("t.ts")),
        )
    )
    naive_pairs = sorted((r.trade_id, r.bid) for r in naive.collect())
    assert got_pairs == naive_pairs
    assert len(got_pairs) > 0


def test_range_join_no_nested_loop(spark, trades, quotes):
    out = temporal.range_join(trades, quotes, on="sym", before_s=60, after_s=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_hierarchy_reaggregates(spark):
    rows = [(i, f"2024-01-0{1 + i % 2} {i % 24:02d}:15:00", float(i)) for i in range(48)]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts")).withColumn(
        "value", F.col("value").cast("decimal(25,6)"))
    out = temporal.rollup_hierarchy(ev, levels=("hour", "day"), aggs={"value": "sum"})
    rows_ = out.collect()
    hours = [r for r in rows_ if r.level == "hour"]
    days = [r for r in rows_ if r.level == "day"]
    assert sum(r.n for r in hours) == 48
    assert sum(r.n for r in days) == 48
    # day buckets reaggregate hour partials exactly
    assert sum(r.sum_value for r in days) == sum(r.sum_value for r in hours)
    assert len(days) == 2

    with pytest.raises(ValueError):
        temporal.rollup_hierarchy(ev, aggs={"value": "avg"})  # not reaggregable


def test_funnel_requires_order(spark):
    import datetime as dt

    from kineo_spark.pipeline import sessions

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, t(1), 1, "view", 1.0, "{}"), (2, t(2), 1, "click", 1.0, "{}"),
        (3, t(3), 1, "purchase", 1.0, "{}"),
        # u2: purchase BEFORE click -> depth 2 blocked at purchase? no:
        # view(1) < click(5); purchase(2) precedes click -> depth 2
        (4, t(1), 2, "view", 1.0, "{}"), (5, t(5), 2, "click", 1.0, "{}"),
        (6, t(2), 2, "purchase", 1.0, "{}"),
        # u3: never viewed
        (7, t(1), 3, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = {r["user_id"]: r["depth"]
           for r in sessions.funnel(df, ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 3: 0}


def test_zscore_outliers_flags_extreme(spark):
    import datetime as dt

    from kineo_spark.pipeline import sessions

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "view", float(v), "{}")
            for i, v in enumerate([10, 11, 9, 10, 10, 11, 9, 10, 1000])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    out = sessions.zscore_outliers(df, z=2.0).collect()
    assert [r["event_id"] for r in out] == [8]
    assert out[0]["zscore"] > 2.0
