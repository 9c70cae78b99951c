"""r12 optimization-round regression tests.

Pins the two plan-shape changes of the round:

1. paths.py size-gated broadcast anti-join + lazy-union accumulator in
   the transitive-closure fixpoint — closures must be identical across
   the broadcast regime (small accumulator), the shuffle regime (gate
   forced off via spark.kineo.path.broadcastAccBytes=0, the pre-r12
   shape), and all three strategies.

2. scale.spread_small_scan — a narrow scan with fewer partitions than
   the cluster parallelism is round-robin repartitioned (the guide §2.5
   unsplittable-input fix); an input that is already wide is returned
   unchanged (the 100 TB no-op side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "`__a` long, `__b` long")


CHAIN = [(i, i + 1) for i in range(40)]
CYCLE = [(100, 101), (101, 102), (102, 100)]
FAN = [(200, 200 + i) for i in range(1, 6)] + \
      [(200 + i, 300) for i in range(1, 6)]


@pytest.mark.parametrize("strategy", ["seminaive", "auto", "doubling"])
@pytest.mark.parametrize("limit", [0, 64 * 1024 * 1024])
def test_closure_identical_across_gate_regimes(spark, strategy, limit):
    from kineo_spark.paths import _closure_pairs

    edges = _edges(spark, CHAIN + CYCLE + FAN)
    spark.conf.set("spark.kineo.path.broadcastAccBytes", "0")
    base = sorted(map(tuple, _closure_pairs(
        edges, 200, strategy="seminaive").collect()))
    spark.conf.set("spark.kineo.path.broadcastAccBytes", str(limit))
    try:
        got = sorted(map(tuple, _closure_pairs(
            edges, 200, strategy=strategy).collect()))
    finally:
        spark.conf.unset("spark.kineo.path.broadcastAccBytes")
    assert got == base
    assert len(base) == 840


@pytest.mark.parametrize("limit", [0, 64 * 1024 * 1024])
def test_seeded_bfs_identical_across_gate_regimes(spark, limit):
    from kineo_spark.paths import _closure_pairs

    edges = _edges(spark, CHAIN + CYCLE + FAN)
    spark.conf.set("spark.kineo.path.broadcastAccBytes", "0")
    fwd = sorted(map(tuple, _closure_pairs(
        edges, 200, seed_col=F.lit(0), strategy="seminaive").collect()))
    rev = sorted(map(tuple, _closure_pairs(
        edges, 200, seed_col=F.lit(300), reverse=True,
        strategy="seminaive").collect()))
    spark.conf.set("spark.kineo.path.broadcastAccBytes", str(limit))
    try:
        got_f = sorted(map(tuple, _closure_pairs(
            edges, 200, seed_col=F.lit(0), strategy="auto").collect()))
        got_r = sorted(map(tuple, _closure_pairs(
            edges, 200, seed_col=F.lit(300), reverse=True,
            strategy="auto").collect()))
    finally:
        spark.conf.unset("spark.kineo.path.broadcastAccBytes")
    assert got_f == fwd and got_r == rev
    # the 40-chain seeded walk runs >16 rounds, so the lazy-union
    # accumulator's compaction path (every 16 rounds) is exercised
    assert len(fwd) == 40


def test_closure_pairs_auto_switch_unchanged(spark):
    """The adaptive crossover heuristic must be unaffected by the r12
    join-shape changes: same switch round, same round count."""
    from kineo_spark.paths import _closure_pairs

    edges = _edges(spark, CHAIN + CYCLE + FAN)
    rounds, switch = [], []
    _closure_pairs(edges, 200, strategy="auto",
                   rounds_out=rounds, switch_out=switch).count()
    assert switch == [7]
    assert len(rounds) == 11


def test_spread_small_scan_repartitions_narrow_input(spark):
    from kineo_spark.scale import spread_small_scan

    df = spark.range(1000).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    out = spread_small_scan(df)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 1000
    assert sorted(r[0] for r in out.collect()) == list(range(1000))


def test_spread_small_scan_noop_when_wide(spark):
    from kineo_spark.scale import spread_small_scan

    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 3)
    out = spread_small_scan(df)
    # already at/above the parallelism target: returned as-is (the
    # plan object itself — no extra exchange inserted)
    assert out is df


def test_spread_small_scan_respects_min_parts(spark):
    from kineo_spark.scale import spread_small_scan

    df = spark.range(100).coalesce(1)
    out = spread_small_scan(df, min_parts=5)
    assert out.rdd.getNumPartitions() == 5
