"""Scale utilities: skew-aware joins, partitioning helpers.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; ``salted_join`` is the explicit fallback for
hot-key aggregations/joins AQE can't split (e.g. a broadcast-unfit
dimension with one giant key), and ``stats`` surfaces the skew profile
(the GraphDescription analog for operational tuning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame, small: DataFrame, on: str, salt: int = 16, how: str = "inner"
) -> DataFrame:
    """Equi-join with key salting: the big side gets a random salt
    bucket, the small side is exploded ×salt — hot keys spread over
    ``salt`` reducers. Use when one key dominates and the small side
    can't broadcast."""
    b = big.withColumn("__salt", (F.rand() * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts + share of total for the hottest keys."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(total))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def repartition_for_join(df: DataFrame, key: str, partitions: int | None = None) -> DataFrame:
    """Pre-partition on a join key so repeated joins against the same
    key reuse one shuffle (bucketing-by-hand for ephemeral frames)."""
    return df.repartition(partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"), key) if partitions else df.repartition(key)


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose partition count is below
    the cluster parallelism — the unsplittable-input fix (optimization
    guide §2.5: "one huge unsplittable file ... repartition immediately
    after the read"). A small parquet table is one row group = one scan
    partition, which serializes every downstream per-row stage (explode,
    Arrow-batched Python decode, per-gram hashing) on a single core no
    matter how wide the cluster is. Apply it where heavy per-row work
    follows a narrow scan; the partition-count check makes it a no-op
    at scale (a 100 TB input has orders of magnitude more splits than
    cores, and then the data already spreads).

    The exchange this inserts moves only the narrow projected input
    (never derived/exploded rows), and only when the input was too
    concentrated for the cluster in the first place."""
    if df.isStreaming:  # no static partition count; micro-batches spread
        return df
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
