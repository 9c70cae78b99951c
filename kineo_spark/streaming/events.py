"""Structured Streaming surface (extension — the reference has NO
streaming of any kind, SURVEY §2.11: its "streams" are lazy pull
iterators; SPARQL UPDATE is declared but unimplemented).

This module gives the engine a streaming ingest + windowed analytics
path over the events-table shape:

- ``stream_events``: file/rate/memory-source reader with event-time
  watermarking.
- ``tumbling_counts`` / ``sliding_counts`` / ``session_windows``:
  watermark + window aggregations (late data handled by Spark's state
  store; state TTL comes from the watermark — designed-in from day one,
  per SURVEY §7.4 hard part 6).
- ``events_to_quads``: continuous relational→RDF mapping, the streaming
  twin of RelationalQuadStore's view (append-only quad production ≈ the
  reference's bulk ``load(version:quads:)``, QuadStore.swift:141-144).
- ``dedup_stream``: exact dedup over a keyed stream with watermarked
  state retention (dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark.model import KIND_IRI, KIND_LITERAL


def stream_events(
    spark, source_dir: str, schema=None, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream of events parquet drops."""
    if schema is None:
        schema = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def tumbling_counts(events: DataFrame, minutes: int = 60, watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def sliding_counts(
    events: DataFrame, length_min: int = 60, slide_min: int = 15, watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{length_min} minutes", f"{slide_min} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_windows(events: DataFrame, gap_min: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Native session windows (F.session_window) — state closes when the
    watermark passes the gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_min} minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact streaming dedup with bounded state (watermarked TTL)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def dedup_stream_against_corpus(
    docs: DataFrame,
    corpus_index: "DataFrame | str",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous incremental dedup — the streaming completion of the
    daily-crawl-vs-archive pattern (pipeline/dedup.py): a document
    stream is deduped (a) WITHIN the stream by normalized fingerprint
    with watermark-bounded state (dropDuplicatesWithinWatermark — exact
    within the watermark horizon, which is the correct streaming
    relaxation: an unbounded exact set is unbounded state), then (b)
    against the PERSISTED corpus via a stream-static left-anti join.
    ``corpus_index`` is a static frame with an ``fp`` column, or (r9)
    the NAME of the bucketed+sorted fingerprint table written by
    dedup.write_corpus_fingerprints — with the bucket count matching
    spark.sql.shuffle.partitions, every micro-batch's anti-join reads
    the archive side pre-partitioned and pre-sorted straight off its
    parquet buckets (zero Exchange, no per-batch Sort; the stream side
    is already hash-partitioned on fp by the dedup state operator).
    That is the archive-scale shape: per micro-batch, total shuffle ≈
    the batch's own fingerprints, never the archive.

    Returns the surviving (id, fp, ts) stream (append mode).
    """
    from kineo_spark.pipeline.dedup import fingerprint

    if isinstance(corpus_index, str):
        corpus_index = docs.sparkSession.table(corpus_index)
    fp = fingerprint(F.col(text_col)).alias("fp")
    new = docs.select(F.col(id_col).alias("id"), fp,
                      F.col(ts_col).alias("ts"))
    in_stream = (new.withWatermark("ts", watermark)
                 .dropDuplicatesWithinWatermark(["fp"]))
    return in_stream.join(corpus_index.select("fp"), "fp", "left_anti")


def events_to_quads(events: DataFrame, with_time: bool = False) -> DataFrame:
    """Streaming relational→RDF: each event row becomes column quads in
    the flat FIXTURES §0 schema (append-only quad stream).

    ``with_time=True`` adds a ``urn:col:events:ts`` dateTime quad whose
    ``num`` shadow is epoch SECONDS (handles both raw nanos-as-long and
    timestamp inputs) — the event-time hook continuous windowed
    aggregates bind (streaming/sparql.continuous_aggregate)."""
    from pyspark.sql import types as T

    s_lex = F.concat(F.lit("urn:t:events:"), F.col("event_id").cast("string"))
    cols = [
        ("event_type", F.col("event_type"), "string", None),
        ("value", F.col("value").cast("string"), "double", F.col("value").cast("double")),
        ("user_id", F.col("user_id").cast("string"), "integer", F.col("user_id").cast("double")),
        ("props", F.col("props"), "string", None),
    ]
    if with_time:
        if isinstance(events.schema["ts"].dataType, T.LongType):
            secs = F.col("ts").cast("double") / 1e9  # raw parquet nanos
        else:
            secs = F.col("ts").cast("double")  # timestamp → epoch seconds
        cols.append(("ts", secs.cast("string"), "dateTime", secs))
    parts = []
    for cname, lex, dt, num in cols:
        parts.append(
            events.select(
                F.lit(KIND_IRI).cast("tinyint").alias("s_kind"),
                s_lex.alias("s_lex"),
                F.lit(f"urn:col:events:{cname}").alias("p_lex"),
                F.lit(KIND_LITERAL).cast("tinyint").alias("o_kind"),
                lex.alias("o_lex"),
                F.lit(dt).alias("o_dt"),
                F.lit(None).cast("string").alias("o_lang"),
                (num if num is not None else F.lit(None).cast("double")).alias("o_num"),
                F.lit("urn:g:events").alias("g_lex"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def view_purchase_join(views: DataFrame, purchases: DataFrame,
                       within_min: int = 60,
                       watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's views in the preceding ``within_min`` minutes. Both sides
    carry watermarks and the join condition bounds event time on BOTH
    sides, so Spark can expire join state — unbounded state is the
    stream-stream-join failure mode at scale, and the time bound is
    what prevents it. (Streaming is an extension: the reference has no
    streaming at all, SURVEY §2.11.)"""
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"), F.col("value"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {within_min} MINUTES")),
        "inner",
    )
