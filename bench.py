"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # SPARQL engine surface
    "sparql_bgp_3hop_join",
    "sparql_agg_q1",
    "sparql_filter_order_limit",
    "sparql_window_rank",
    "sparql_window_running_sum",
    "sparql_path_alt_plus",
    "sparql_minus",
    "sparql_group_concat",
    # LLM-pipeline surface
    "pipe_dedup_exact",
    "pipe_dedup_ngram_jaccard",
    "pipe_dedup_minhash_lsh",
    "pipe_knn_bruteforce",
    "pipe_langid",
    "pipe_sessionize",
    "pipe_tumbling_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entry
    from kineo_spark.session import get_spark

    spark = get_spark("kineo-bench")
    qs = entry.queries()

    # warm the JVM + parquet footers with one tiny action
    spark.range(1).count()

    # best-of-2 per query: the shared-host VM shows multi-minute noise
    # spikes that land on random queries; min-of-2 measures the plan,
    # not the neighbor
    times: dict[str, float] = {}
    for name in HEADLINE:
        f = qs[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                n = f(spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best is None or dt < best else best
            except Exception as e:  # record failures as -1, keep benching
                best = -1.0
                print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                break
        times[name] = best
        if best >= 0:
            print(f"# {name}: {best}s ({n} rows)", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "headline_total_wall_best_of_2",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
