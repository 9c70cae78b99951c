"""Continuous SPARQL (extension — the reference has no streaming at
all, SURVEY §2.11): run the algebra compiler against a STREAMING quads
DataFrame, so a standing SELECT/CONSTRUCT emits incremental results as
new quads arrive.

This works because the whole compiler is declarative: every operator is
a DataFrame transformation, compile is side-effect free (the round-2
explain-purity contract), and ``QuadsDataFrameStore`` never materializes
— so handing it a streaming DataFrame yields a streaming bindings plan
that Spark's incremental planner executes per micro-batch.

Streamable algebra (append output mode):
- BGP joins: each pattern scan filters the quad stream; multi-pattern
  joins become stream-stream equi-joins on term keys (Spark keeps
  symmetric hash state; with availableNow or a watermarked source the
  state is bounded by the run).
- FILTER / BIND / UNION / projection / VALUES (static side broadcast).
- DISTINCT (stateful dedup, state grows with distinct keys).
Not streamable in append mode (Spark raises AnalysisException, we let
it propagate rather than mask it): ORDER BY / LIMIT without windows,
ungrouped aggregates, OPTIONAL (outer stream-stream joins need
time-bound conditions + watermarks on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kineo_spark.engine import Engine
from kineo_spark.store import QuadsDataFrameStore


def streaming_engine(spark: SparkSession, quads_stream: DataFrame) -> Engine:
    """An Engine whose store is a streaming quads DataFrame."""
    return Engine(QuadsDataFrameStore(spark, quads_stream))


def continuous_query(spark: SparkSession, quads_stream: DataFrame, sparql: str) -> DataFrame:
    """Compile a SPARQL SELECT/CONSTRUCT against the quad stream and
    return the streaming result DataFrame (attach your own writeStream
    sink + trigger). ASK/DESCRIBE need a bounded snapshot — use the
    batch engine on a sink table instead."""
    res = streaming_engine(spark, quads_stream).query(sparql)
    if res.form == "select":
        return res.bindings
    if res.form == "triples":
        return res.triples
    raise ValueError(
        f"streaming supports SELECT and CONSTRUCT, not {res.form!r}"
    )


def run_available_now(
    result: DataFrame, name: str, timeout_s: int = 120
) -> DataFrame:
    """One-shot drain of a continuous query into an in-memory table —
    the batch-equivalence harness used by the tests."""
    q = (
        result.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout_s)
    return result.sparkSession.table(name)
