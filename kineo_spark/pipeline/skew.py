"""Skew-safe aggregation patterns: two-phase top-k per group.

A `row_number().over(Window.partitionBy(g))` sends EVERY row of a group
through one task — correct until one group is a mega-group (the
Common-Crawl single-domain problem), then that task is the job. The
two-phase shape bounds it:

1. local: each input partition keeps its own top-k per group (a
   per-partition sort touching only that partition's rows — no
   shuffle);
2. global: only the surviving ≤ k·partitions candidates per group
   shuffle to the final per-group top-k window.

The result is row-identical to the naive global window (top-k is
decomposable: the global top-k is contained in the union of local
top-ks), but the post-shuffle work per group is bounded by
k·n_partitions regardless of group size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk_per_group(
    df: DataFrame, group: str, order: list[Column], k: int,
) -> DataFrame:
    """Top-k rows per ``group`` under the ``order`` sort, two-phase.
    Returns the input columns plus ``rank_in_group`` (1-based)."""
    local = Window.partitionBy(F.spark_partition_id(), group).orderBy(*order)
    survivors = (
        df.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    final = Window.partitionBy(group).orderBy(*order)
    return (
        survivors.withColumn("rank_in_group", F.row_number().over(final))
        .filter(F.col("rank_in_group") <= k)
    )
