"""Skew-safe aggregation patterns: two-phase top-k per group.

A `row_number().over(Window.partitionBy(g))` naively sends EVERY row of
a group through one task — correct until one group is a mega-group (the
Common-Crawl single-domain problem), then that task is the job. The
classic fix is two-phase: each input partition keeps its local top-k
per group (no shuffle), then only the surviving ≤ k·n_partitions
candidates shuffle to the final per-group window.

On Spark ≥3.5 the optimizer does this itself: a rank/row_number window
followed by a `<= k` filter plans as

    WindowGroupLimit [g] ... Partial      <- map-side top-k, pre-shuffle
    Exchange hashpartitioning(g)          <- ships ≤ k rows per key per
    WindowGroupLimit [g] ... Final           map task, NOT the group
    Window [row_number() ...]

so the plain window IS the two-phase plan — the Partial group-limit
bounds what the hot key ships exactly like a hand-written local phase.
A manual `partitionBy(spark_partition_id(), g)` pre-window is strictly
worse here: Catalyst cannot see that SPARK_PARTITION_ID() is
partition-local, so it inserts an EXTRA Exchange on (pid, g) before the
"local" phase (measured in round 4 — the manual shape had 2 shuffles,
this one has 1). tests/test_plan_quality.py pins the single-Exchange +
Partial-group-limit shape so a Spark upgrade or refactor can't silently
regress it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk_per_group(
    df: DataFrame, group: str, order: list[Column], k: int,
) -> DataFrame:
    """Top-k rows per ``group`` under the ``order`` sort; skew-safe via
    the optimizer's partial WindowGroupLimit (see module docstring).
    Returns the input columns plus ``rank_in_group`` (1-based)."""
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )
