"""Deterministic sampling, domain mixing, and shard packing for
training-data pipelines (driver-mandated LLM-pipeline extension; no
reference analog — the reference has no corpus-curation surface).

Everything here is a pure Column-expression transform (no UDFs, no
state, no RNG): selection is keyed on the first 8 hex chars of
``md5(key)``, so membership is

- **stable** across runs, partitionings, and cluster sizes (unlike
  ``DataFrame.sample``, whose output depends on partition layout),
- **portable** — any engine with md5 reproduces the same picks, which
  is also what makes the DuckDB oracles exact (lexicographic compare of
  zero-padded hex == integer compare of the 32-bit bucket),
- **shuffle-free** — sampling and splitting are filters/projections the
  parquet scan absorbs; only pack_shards needs a (per-group) sort.

At 100 TB: hash-gating is the standard way to subsample or split a
corpus without materializing an index; per-stratum rates implement
domain mixing (e.g. rebalance languages/sources toward a target
distribution) in a single pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1 << 32  # 8 hex chars


def hash_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 2^32): first 8 hex chars of md5(key)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")


def threshold(rate: float) -> int:
    """Bucket threshold for a keep-rate; keep iff bucket < threshold."""
    return int(rate * _BUCKETS)


def threshold_hex(rate: float) -> str:
    """The same threshold as a zero-padded hex literal, for expressing
    the identical predicate in SQL engines: md5(key) < '<hex>'."""
    return format(threshold(rate), "08x")


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep a stable ``rate`` fraction of rows, keyed on ``key``."""
    return df.filter(hash_bucket(F.col(key)) < threshold(rate))


def stratified_sample(
    df: DataFrame, key: str, strata: str,
    rates: dict[str, float], default_rate: float = 0.0,
) -> DataFrame:
    """Domain mixing: per-stratum keep-rates (e.g. per language/source),
    one filter pass, no shuffle."""
    thr: Column = F.lit(threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata) == value, F.lit(threshold(rate))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key)) < thr)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], col: str = "split",
) -> DataFrame:
    """Disjoint train/val/test split by hash range: every key lands in
    exactly one named split, stably. Weights must sum to ≤ 1; any
    remainder is dropped (useful for held-out headroom)."""
    bucket = hash_bucket(F.col(key))
    expr = None
    lo = 0
    for name, w in weights.items():
        hi = lo + int(w * _BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    out = df.withColumn(col, expr)
    return out.filter(F.col(col).isNotNull())


def pack_shards(
    df: DataFrame, key: str, size_col: str, budget: int,
    partition_by: str | None = None, col: str = "shard",
) -> DataFrame:
    """Assign rows to contiguous shards of ~``budget`` cumulative
    ``size_col`` (token-budget sharding), deterministically ordered by
    ``key``: shard = floor(running-size-before-this-row / budget).

    Scale note: the running sum needs a total order, so shard within
    ``partition_by`` groups (language, source, date bucket) — each group
    sorts independently and in parallel; an unpartitioned call is a
    single-reducer sort and only acceptable for small curated sets."""
    w = (Window.partitionBy(partition_by) if partition_by else
         Window.partitionBy()).orderBy(key)
    before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(col, F.floor(before / F.lit(budget)))


def upsample(df: DataFrame, key: str, factor: float, col: str = "epoch") -> DataFrame:
    """Deterministic fractional up/down-sampling for training mixtures:
    each row appears floor(factor) times, plus one more time for the
    stable hash-gated fraction frac(factor) of keys — e.g. factor=2.3
    repeats every row twice and a stable 30% of rows a third time
    (how data mixtures express 'see this source ~2.3 epochs'). A
    factor < 1 downsamples. Output rows carry a 1-based ``col`` epoch
    number. Pure Column explode — no RNG, no shuffle, repeats are
    co-located with their source row."""
    base = int(factor)
    frac = factor - base
    n = (F.lit(base)
         + (hash_bucket(F.col(key)) < F.lit(threshold(frac))).cast("int"))
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>"))
    return df.withColumn(col, F.explode(seq))


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact quality-greedy subset selection under a token budget: keep
    the best documents (by ``quality_col`` descending, id ascending for
    determinism) whose cumulative token count fits in ``budget``.

    The naive formulation is ONE global cumulative-sum window — a
    single-partition bottleneck at corpus scale. Instead the cumsum is
    split hierarchically: a per-quality-bucket total (tiny table, its
    prefix sum is O(#distinct qualities)) broadcast back, plus a
    per-bucket windowed cumsum that parallelizes across buckets. The
    result is bit-identical to the global window.

    Returns (doc_id, quality, n_tokens, cum_tokens) for selected docs.
    """
    from pyspark.sql import Window

    from kineo_spark.pipeline.text import token_count

    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).alias("q"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    per_bucket = d.groupBy("q").agg(F.sum("n_tokens").alias("bt"))
    wb = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = per_bucket.select(
        "q", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("before")
    )
    wd = Window.partitionBy("q").orderBy("doc_id")
    return (
        d.join(F.broadcast(bucket_prefix), "q")
        .withColumn("cum_tokens", F.col("before") + F.sum("n_tokens").over(wd))
        .filter(F.col("cum_tokens") <= budget)
        .select(
            "doc_id", F.col("q").alias("quality"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )
