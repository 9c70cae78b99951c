"""Mergeable sketches for corpus statistics: per-shard HyperLogLog
distinct-count sketches that union into exact-shape global estimates.

The 100 TB pattern this encodes: never count distincts globally at read
time — each ingest shard/partition writes a tiny binary sketch next to
its data, and ANY grouping of those sketches (per source, per day, the
whole corpus) is answerable later by a cheap union over kilobytes, no
rescan. Spark 3.5+/4 ships Datasketches HLL natively
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), so the
whole path is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sketch_by(
    df: DataFrame, key: str, group: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch of ``key`` per ``group`` value (e.g. distinct
    users per source). Returns (group, sketch: binary, n_rows)."""
    return df.groupBy(F.col(group).alias("group")).agg(
        F.hll_sketch_agg(F.col(key).cast("string"), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate(sketches: DataFrame) -> DataFrame:
    """Per-group distinct estimates from stored sketches.
    Returns (group, n_rows, approx_distinct)."""
    return sketches.select(
        "group", "n_rows",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )


def merge_estimate(sketches: DataFrame, lg_k: int = 12) -> DataFrame:
    """Global distinct estimate by unioning every group's sketch —
    the re-aggregation HLL exists for: no rescan of the base data.
    Returns one row (n_groups, n_rows, approx_distinct)."""
    return sketches.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(False))
        ).alias("approx_distinct"),
    )
