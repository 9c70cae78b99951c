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


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack0",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): lay every document's tokens end-to-end in a deterministic
    md5-shuffled order, then cut the stream into fixed ``seq_len``
    training sequences. Emits one row per (document × sequence it
    overlaps) with the exact slice coordinates a tokenizer worker needs
    — no padding, no truncation, cross-document boundaries preserved by
    the slice map.

    The global token offset is the classic single-reducer cumsum trap;
    here it is computed hierarchically (16 ordered hex buckets of the
    order key: tiny per-bucket totals prefix-summed and broadcast, plus
    a parallel within-bucket window), bit-identical to the naive global
    window the oracle runs.

    Returns (doc_id, seq_id, doc_slice_start, seq_offset, slice_len):
    tokens[doc_slice_start : doc_slice_start+slice_len] of the document
    land at seq_offset inside sequence seq_id.
    """
    from kineo_spark.pipeline.text import token_count

    key = F.md5(F.concat_ws("\x1f", F.lit(seed), F.col(id_col).cast("string")))
    d = df.select(
        F.col(id_col).alias("doc_id"),
        key.alias("key"),
        F.substring(key, 1, 1).alias("bucket"),
        token_count(F.col(text_col)).alias("n")
    ).filter(F.col("n") > 0)
    per_bucket = d.groupBy("bucket").agg(F.sum("n").alias("bt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = per_bucket.select(
        "bucket", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("before"))
    wd = Window.partitionBy("bucket").orderBy("key", "doc_id")
    placed = (
        d.join(F.broadcast(prefix), "bucket")
        .withColumn(
            "start",
            F.col("before")
            + F.coalesce(
                F.sum("n").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)),
        )
    )
    L = F.lit(seq_len)
    s0 = F.floor(F.col("start") / L)
    s1 = F.floor((F.col("start") + F.col("n") - 1) / L)
    out = placed.select(
        "doc_id", "start", "n", F.explode(F.sequence(s0, s1)).alias("seq_id"))
    lo = F.greatest(F.col("start"), F.col("seq_id") * L)
    hi = F.least(F.col("start") + F.col("n"), (F.col("seq_id") + 1) * L)
    return out.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        (lo - F.col("start")).cast("long").alias("doc_slice_start"),
        (lo - F.col("seq_id") * L).cast("long").alias("seq_offset"),
        (hi - lo).cast("long").alias("slice_len"),
    )


def temperature_sample(
    df: DataFrame, key: str, strata: str, alpha: float = 0.5,
) -> DataFrame:
    """Temperature / alpha-sampling over strata (the multilingual
    balancing rule of mBERT/XLM-R: sample stratum l with probability
    ∝ n_l^alpha, alpha < 1 flattening the distribution): per-stratum
    keep-rate = (n_l/n_min)^(alpha-1), anchored so the SMALLEST stratum
    keeps 100% and every larger stratum is downsampled toward the
    flattened target shares (sampling can only remove rows; upsampling
    is `upsample`'s job). Deterministic md5 gating keeps the picks
    stable and engine-portable.

    The rate is rounded to 6 decimals BEFORE thresholding so any SQL
    oracle computing the same formula lands on the identical integer
    threshold (pow() across engines agrees to far more than 6 dp).

    One count aggregation (broadcast back) + one filter pass — no
    shuffle of the data itself. Returns the kept rows as
    (id, stratum, rate).
    """
    d = df.select(F.col(key).alias("id"), F.col(strata).alias("stratum"))
    counts = d.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
    nmin = counts.agg(F.min("n").alias("nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "stratum",
        F.round(
            F.pow(F.col("n").cast("double") / F.col("nmin"),
                  F.lit(alpha - 1.0)), 6,
        ).alias("rate"),
    )
    thr = (F.col("rate") * F.lit(float(_BUCKETS))).cast("long")
    return (
        d.join(F.broadcast(rates), "stratum")
        .filter(hash_bucket(F.col("id")) < thr)
        .select("id", "stratum", "rate")
    )
