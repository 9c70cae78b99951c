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


def kll_sketch_by(
    df: DataFrame, value: str, group: str, k: int = 200
) -> DataFrame:
    """One KLL quantile sketch of ``value`` (double) per ``group`` —
    the percentile analog of the HLL pattern above: per-shard sketches
    persist as kilobytes and answer any later p50/p99 question without
    rescanning. Returns (group, ksketch: binary, n_rows)."""
    return df.groupBy(F.col(group).alias("group")).agg(
        F.kll_sketch_agg_double(
            F.col(value).cast("double"), F.lit(k)).alias("ksketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def kll_quantiles(
    sketches: DataFrame, probs: list[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Per-group quantile estimates from stored KLL sketches.
    Returns (group, n_rows, q50, q90, ... named q<percent>)."""
    cols = [
        F.kll_sketch_get_quantile_double("ksketch", F.lit(float(p)))
         .alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return sketches.select("group", "n_rows", *cols)


def kll_merge_quantiles(
    sketches: DataFrame, probs: list[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Global quantiles by merging every group's sketch — no rescan.
    Returns one row (n_groups, n_rows, q50, q90, ...)."""
    collected = sketches.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.collect_list("ksketch").alias("arr"),
    )
    # kll_sketch_merge_double is a binary merge; fold it over the
    # collected sketch list (group count is small by construction —
    # sketches per source/day, not per row)
    m = F.reduce(
        F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0))),
        F.element_at(F.col("arr"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    merged = collected.select("n_groups", "n_rows", m.alias("m"))
    cols = [
        F.kll_sketch_get_quantile_double("m", F.lit(float(p)))
         .alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return merged.select("n_groups", "n_rows", *cols)
