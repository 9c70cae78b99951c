"""Structured Streaming surface tests: run each streaming query with an
availableNow file source over a small events sample and compare against
the batch twin."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kineo_spark.store import read_table
from kineo_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark):
    d = tempfile.mkdtemp(prefix="kineo_stream_")
    df = read_table(spark, SF, "events").limit(500)
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_equals_batch(spark, event_dir):
    batch = spark.read.parquet(event_dir)
    stream = se.stream_events(spark, event_dir)
    out = _run_stream(spark, se.tumbling_counts(stream, minutes=60), "t_tumble")
    got = {
        (r["window"]["start"], r["event_type"]): r["n"] for r in out.collect()
    }
    expect = {
        (r["ws"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect


def test_streaming_session_windows(spark, event_dir):
    stream = se.stream_events(spark, event_dir)
    out = _run_stream(spark, se.session_windows(stream, gap_min=30), "t_sess")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_dedup(spark, event_dir):
    stream = se.stream_events(spark, event_dir)
    q = (
        se.dedup_stream(stream)
        .writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    assert got.count() == got.select("event_id").distinct().count()


def test_streaming_events_to_quads(spark, event_dir):
    stream = se.stream_events(spark, event_dir)
    q = (
        se.events_to_quads(stream)
        .writeStream.format("memory").queryName("t_quads")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_quads")
    n_events = spark.read.parquet(event_dir).count()
    assert got.count() == n_events * 4  # 4 column-quads per event
    assert got.filter(F.col("p_lex") == "urn:col:events:value").count() == n_events
