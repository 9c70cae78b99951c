"""Event-stream analytics in batch form: sessionization, tumbling
windows, per-group top-k. The Structured Streaming twins live in
kineo_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the user's previous event exceeds the gap. Adds
    ``session_seq`` (1-based per user)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_minutes * 60 * 1_000_000)
    ).cast("int")
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: event count, span seconds, total value."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1e6).alias("span_sec"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 6).alias("total_value"),
        )
    )


def tumbling_counts(
    df: DataFrame, ts_col: str = "ts", key_col: str = "event_type",
    hours: int = 1,
) -> DataFrame:
    """Tumbling-window counts per key (batch twin of the streaming
    windowed aggregation)."""
    bucket = F.date_trunc("hour", F.col(ts_col)) if hours == 1 else F.timestamp_seconds(
        (F.unix_seconds(F.col(ts_col)) / (hours * 3600)).cast("long") * hours * 3600
    )
    return (
        df.groupBy(bucket.alias("window_start"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 6).alias("total_value"),
        )
    )


def top_k_by_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str,
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def zscore_outliers(df: DataFrame, group: str = "event_type",
                    value: str = "value", z: float = 3.0) -> DataFrame:
    """Per-group z-score outlier flags: rows whose value deviates more
    than ``z`` sample standard deviations from the group mean. One
    aggregation broadcast back + one filter pass — the standard
    monitoring sweep over an event firehose, no shuffle of the events
    themselves. Returns outlier rows (event_id, group, value, zscore
    rounded to 6)."""
    stats = df.groupBy(F.col(group).alias("group")).agg(
        F.avg(value).alias("mu"), F.stddev_samp(value).alias("sd"))
    return (
        df.select("event_id", F.col(group).alias("group"), F.col(value).alias("v"))
        .join(F.broadcast(stats), "group")
        .withColumn("zscore", F.round((F.col("v") - F.col("mu")) / F.col("sd"), 6))
        .filter(F.abs(F.col("zscore")) > z)
        .select("event_id", "group", F.col("v").alias("value"), "zscore")
    )


def funnel(df: DataFrame, stages: list[str],
           user: str = "user_id", ts: str = "ts") -> DataFrame:
    """Ordered conversion funnel: for each user, how far through
    ``stages`` they progressed, requiring each stage's FIRST occurrence
    to come strictly after the previous stage's first occurrence. One
    aggregation (min timestamp per user per stage via conditional
    min) — no self-joins, no windows. Returns (user_id, depth)."""
    aggs = [
        F.min(F.when(F.col("event_type") == s, F.col(ts))).alias(f"t{i}")
        for i, s in enumerate(stages)
    ]
    m = df.groupBy(F.col(user).alias("user_id")).agg(*aggs)
    depth = F.when(F.col("t0").isNull(), F.lit(0))
    cond = F.col("t0").isNotNull()
    for i in range(1, len(stages)):
        prev_ok = cond
        cond = cond & F.col(f"t{i}").isNotNull() & (
            F.col(f"t{i}") > F.col(f"t{i-1}"))
        depth = depth.when(prev_ok & ~cond, F.lit(i))
    depth = depth.otherwise(F.lit(len(stages)))
    return m.select("user_id", depth.alias("depth"))


def retention_cohorts(df: DataFrame, user: str = "user_id",
                      ts: str = "ts", bucket_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (cohort), counted in every later bucket they reappear in.
    Two aggregations — first-activity per user (broadcast back via an
    equi-join on user), then distinct users per (cohort, offset). The
    product-analytics staple. Returns (cohort, offset, n_users)."""
    b = F.floor(F.unix_timestamp(ts) / F.lit(bucket_days * 86400)).cast("long")
    acts = df.select(F.col(user).alias("u"), b.alias("b")).distinct()
    first = acts.groupBy("u").agg(F.min("b").alias("cohort"))
    return (
        acts.join(first, "u")
        .groupBy("cohort", (F.col("b") - F.col("cohort")).alias("offset"))
        .agg(F.count_distinct("u").alias("n_users"))
    )
