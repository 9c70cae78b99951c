"""High-diameter path-closure stress: semi-naive vs path-doubling
(VERDICT r10 #3).

The doubling strategy (paths.py _closure_pairs) claims an O(log d)
round win on high-diameter graphs at the cost of quadratic composition
intermediates. This harness makes both sides of that trade MEASURED
numbers on the two lineage shapes that bracket real workloads:

- ``chain(d)``: one path of length d (the worst case for semi-naive's
  round count AND for doubling's composition size: the R∘R join
  materializes ~d^3/6 rows before dedup in its last round).
- ``forest(depth, width)``: a wide, shallow lineage forest (every node
  one parent, ``depth`` layers of ``width`` nodes) — the typical
  dataset-lineage / org-hierarchy shape: millions of nodes, diameter
  in the tens. Composition through a FOREST stays linear in the
  closure (every node has ≤ depth ancestors), so doubling's
  intermediate blowup does not apply; the round win does.

Per (shape, strategy) it records executed fixpoint rounds (from the
kernel itself, rounds_out), wall seconds, closure pairs, and
shuffle-write bytes — then prints one JSON line for
STRESS_PATH_DIAMETER_r{N}.json. Both strategies must agree on the
closure EXACTLY (asserted per shape) or the row is invalid.

Run:  python tools/stress_path_diameter.py [out.json]
Env:  STRESS_CHAIN_DIAMS=250,1000  STRESS_FOREST="12x200000"
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_DIAMS = [int(x) for x in
               os.environ.get("STRESS_CHAIN_DIAMS", "250,1000").split(",")
               if x]
FOREST = os.environ.get("STRESS_FOREST", "12x200000")


def _shuffle_write_bytes(spark) -> int:
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages",
                timeout=10) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def _chain_edges(spark, d: int):
    """Edges i -> i+1 for i in [0, d): one path, diameter d, closure
    d(d+1)/2 pairs."""
    from pyspark.sql import functions as F

    return (spark.range(d)
            .select(F.col("id").alias("__a"),
                    (F.col("id") + 1).alias("__b")))


def _forest_edges(spark, depth: int, width: int):
    """Layered lineage forest: node (l, i) in layers 1..depth has ONE
    parent in layer l-1 chosen deterministically (xxhash64 of the child
    id mod width) — depth*width child nodes (+ ≤width layer-0 roots),
    depth*width edges, longest ancestor path = depth edges (so the
    recorded diameter is the measured one — ADVICE r11 fixed the
    range(1, depth) off-by-one that made it depth-1), every node
    ≤ depth ancestors, so the closure is ~depth^2/2 * width pairs and
    composition through any node is bounded by depth (no quadratic
    blowup for doubling)."""
    from pyspark.sql import functions as F

    nid = F.col("layer") * (width * 2) + F.col("i")  # injective node ids
    layers = (spark.range(1, depth + 1)
              .select(F.col("id").alias("layer"))
              .crossJoin(spark.range(width).select(F.col("id").alias("i"))))
    parent_i = F.pmod(F.xxhash64(nid), F.lit(width))
    parent = (F.col("layer") - 1) * (width * 2) + parent_i
    return layers.select(nid.alias("__a"), parent.alias("__b"))


def _measure(spark, edges, max_iters: int, strategy: str) -> dict:
    from kineo_spark.paths import _closure_pairs

    edges = edges.localCheckpoint(eager=True)  # exclude generation cost
    rounds: list = []
    switch: list = []
    s0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    acc = _closure_pairs(edges, max_iters, strategy=strategy,
                         rounds_out=rounds, switch_out=switch)
    pairs = acc.count()
    wall = round(time.time() - t0, 2)
    s1 = _shuffle_write_bytes(spark)
    return {
        "strategy": strategy,
        "rounds": len(rounds),
        "switch_round": switch[0] if switch else None,
        "wall_sec": wall,
        "pairs": pairs,
        "shuffle_mb": (round((s1 - s0) / 1e6, 1)
                       if s0 >= 0 and s1 >= 0 else -1),
    }


def main() -> None:
    os.environ.setdefault("KINEO_UI", "1")
    from kineo_spark import get_spark

    spark = get_spark("stress-path-diameter",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1).count()

    # Strategy sets per shape. Semi-naive on the chains is skippable
    # (STRESS_SEMINAIVE_CHAINS=1 opts in): r11 measured it at 290 s /
    # 4784 s for d=250/1000 (STRESS_PATH_DIAMETER_r11.json) and the
    # point of this round's row is AUTO vs the better strategy.
    chain_strats = ["doubling", "auto"]
    if os.environ.get("STRESS_SEMINAIVE_CHAINS"):
        chain_strats.append("seminaive")
    rows = []
    hybrid_ok = True
    for d in CHAIN_DIAMS:
        edges = _chain_edges(spark, d)
        per = {}
        for strategy in chain_strats:
            r = _measure(spark, edges, d + 2, strategy)
            r.update({"shape": "chain", "diameter": d, "edges": d})
            rows.append(r)
            per[strategy] = r
            print(f"# chain d={d} {strategy}: {r['rounds']} rounds "
                  f"(switch={r['switch_round']}), {r['wall_sec']}s, "
                  f"{r['pairs']} pairs, {r['shuffle_mb']} MB shuffle",
                  file=sys.stderr)
        assert len({r["pairs"] for r in per.values()}) == 1, per
        best = min(r["wall_sec"] for s, r in per.items() if s != "auto")
        per["auto"]["vs_best"] = round(per["auto"]["wall_sec"] / best, 3)
        hybrid_ok &= per["auto"]["vs_best"] <= 1.3

    depth, width = (int(x) for x in FOREST.split("x"))
    edges = _forest_edges(spark, depth, width)
    n_edges = edges.count()
    per = {}
    for strategy in ("doubling", "seminaive", "auto"):
        r = _measure(spark, edges, depth + 2, strategy)
        r.update({"shape": "forest", "diameter": depth, "edges": n_edges})
        rows.append(r)
        per[strategy] = r
        print(f"# forest {depth}x{width} {strategy}: {r['rounds']} rounds "
              f"(switch={r['switch_round']}), {r['wall_sec']}s, "
              f"{r['pairs']} pairs, {r['shuffle_mb']} MB shuffle",
              file=sys.stderr)
    assert len({r["pairs"] for r in per.values()}) == 1, per
    best = min(r["wall_sec"] for s, r in per.items() if s != "auto")
    per["auto"]["vs_best"] = round(per["auto"]["wall_sec"] / best, 3)
    hybrid_ok &= per["auto"]["vs_best"] <= 1.3

    out = {"metric": "path_closure_diameter_stress", "rows": rows,
           "hybrid_within_1_3x_of_best": hybrid_ok,
           "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
