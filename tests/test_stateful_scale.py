"""Stateful streaming sessionizer + scale utility tests."""

import pytest
from pyspark.sql import functions as F

from kineo_spark.scale import key_skew_stats, salted_join


def test_stateful_sessionizer(spark, tmp_path):
    from kineo_spark.streaming.stateful import sessionize_stateful

    rows = [
        (1, "2024-01-01 00:00:00", 7, 1.0),
        (2, "2024-01-01 00:10:00", 7, 2.0),
        (3, "2024-01-01 02:00:00", 7, 3.0),   # closes session 1 (gap 110m)
        (4, "2024-01-01 05:00:00", 7, 4.0),   # closes session 2
        (5, "2024-01-01 00:05:00", 8, 5.0),
        (6, "2024-01-01 06:00:00", 8, 6.0),   # closes user 8's session 1
    ]
    src = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "events")
    src.coalesce(1).write.parquet(d)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .parquet(d)
    )
    q = (
        sessionize_stateful(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("t_stateful")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.table("t_stateful").collect()
    }
    # closed sessions only (the watermark never passes in a single batch,
    # so the final open sessions stay in state)
    assert (7, 2, 3.0) in got      # events 1+2
    assert (7, 1, 3.0) in got      # event 3
    assert (8, 1, 5.0) in got      # event 5


def test_salted_join_and_skew_stats(spark):
    big = spark.range(0, 10000).select(
        F.when(F.col("id") < 9000, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(100)], "k long, name string")
    out = salted_join(big, small, "k", salt=8)
    assert out.count() == big.join(small, "k").count()
    stats = key_skew_stats(big, "k", top=1).collect()
    assert stats[0]["k"] == 1 and stats[0]["share"] > 0.8
