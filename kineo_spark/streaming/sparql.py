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
    result: DataFrame, name: str, timeout_s: int = 120,
    state_partitions: int | None = None,
) -> DataFrame:
    """One-shot drain of a continuous query into an in-memory table —
    the batch-equivalence harness used by the tests.

    ``state_partitions`` right-sizes the stateful-operator partition
    count for this query (stream-stream joins keep one state store per
    shuffle partition per side; the count is frozen into the checkpoint
    at first start). The session default targets batch scans — a
    micro-batch of N events wants state stores sized to N, not to the
    batch default: measured on the 150k-event drain, 32 stores cost
    7.0s vs 3.8s at 8 (state-store open/commit is per-store fixed
    cost). A production deployment sizes this to stream volume."""
    spark = result.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            result.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(timeout_s)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


def continuous_aggregate(
    spark: SparkSession,
    quads_stream: DataFrame,
    sparql: str,
    time_var: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Continuous windowed SPARQL aggregate (extension): compile a
    SELECT with GROUP BY/aggregates against the quad stream, bind event
    time from ``time_var`` (a variable whose values are dateTime/numeric
    epoch-seconds terms — the `num` shadow), and evaluate the aggregate
    per event-time window with a watermark, so late data is bounded and
    state expires. SPARQL itself has no time axis; the window is the
    standing-query analog of re-running the query per period.

    Returns the streaming result with (window_start, window_end,
    <group vars>, <aggregate vars>) — append mode, one row per closed
    window per group.
    """
    from pyspark.sql import functions as F

    from kineo_spark import algebra as A
    from kineo_spark.aggregates import _agg_column
    from kineo_spark.compiler import _env
    from kineo_spark.expr import compile_expr
    from kineo_spark.model import term_key
    from kineo_spark.rewrite import rewrite
    from kineo_spark.sparql_parser import parse_query

    q = parse_query(sparql)
    if not isinstance(q, A.SelectQuery):
        raise ValueError("continuous_aggregate needs a SELECT query")
    # the parser wraps Aggregate in Project/Extend (the AS aliases);
    # unwrap, remembering plain-var renames to re-apply after the
    # windowed aggregation
    node = q.algebra
    renames: dict[str, str] = {}
    while not isinstance(node, A.Aggregate):
        if isinstance(node, A.Project):
            node = node.child
        elif isinstance(node, A.Extend) and isinstance(node.expr, type(None)):
            node = node.child
        elif isinstance(node, A.Extend) and type(node.expr).__name__ == "EVar":
            renames[node.expr.name] = node.name
            node = node.child
        else:
            raise ValueError(
                "continuous_aggregate needs a plain GROUP BY/aggregate "
                f"SELECT (found {type(node).__name__})")
    child = streaming_engine(spark, quads_stream).compiler.compile(
        rewrite(node.child))
    df = child.df
    if time_var not in df.columns:
        raise ValueError(f"time variable ?{time_var} is not bound by the pattern")
    work = df.withColumn(
        "__et", F.col(time_var)["num"].cast("timestamp")
    ).withWatermark("__et", watermark_delay)
    env = _env(work)
    group_terms = {
        name: compile_expr(e, env)
        for name, e in zip(node.group_names, node.groups)
    }
    work = work.select(
        "*",
        *[term_key(t).alias(f"__gk_{n}") for n, t in group_terms.items()],
        *[t.alias(f"__gt_{n}") for n, t in group_terms.items()],
    )
    env2 = {v: work[v] for v in df.columns if not v.startswith("__")}
    aggs = []
    for var, spec in node.aggs:
        value = compile_expr(spec.expr, env2) if spec.expr is not None else None
        aggs.append(_agg_column(spec, value).alias(var))
    # group terms ride as extra group keys (functionally dependent on
    # the term-key string) instead of first() aggregates — same reason
    # as aggregates.compile_aggregate (non-mutable first() buffers force
    # SortAggregate), and streaming state then holds no term payload
    # beyond the key itself.
    out = work.groupBy(
        F.window("__et", window_duration).alias("__w"),
        *[F.col(f"__gk_{n}") for n in group_terms],
        *[F.col(f"__gt_{n}").alias(n) for n in group_terms],
    ).agg(*aggs)
    return out.select(
        F.col("__w")["start"].alias("window_start"),
        F.col("__w")["end"].alias("window_end"),
        *group_terms.keys(),
        *[F.col(var).alias(renames.get(var, var)) for var, _ in node.aggs],
    )
