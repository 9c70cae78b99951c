"""A/B one path-query arm in a fresh process (r13 scripted-loop work).

Usage: python tools/ab_path.py <query> <localClosureBytes> [runs]
Prints one JSON line: per-rebuild walls, min, steady-state shuffle MB
(last run's delta), jobs delta for the last run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    lc = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    os.environ.setdefault("KINEO_UI", "1")
    import __spark_entry__ as entry
    from kineo_spark.session import get_spark

    spark = get_spark("kineo-ab-path")
    spark.conf.set("spark.kineo.path.localClosureBytes", lc)
    qs = entry.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1).count()

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def counters():
        try:
            with urllib.request.urlopen(
                    f"{base}/api/v1/applications/{app}/stages?status=complete",
                    timeout=10) as r:
                st = json.load(r)
            return (len(st), sum(s.get("shuffleWriteBytes", 0) for s in st))
        except Exception:
            return (-1, -1)

    f = qs[name]
    walls = []
    sh_last = -1.0
    for i in range(runs):
        c0 = counters()
        t0 = time.perf_counter()
        n = f(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
        c1 = counters()
        sh_last = round((c1[1] - c0[1]) / 1e6, 3)
    print(json.dumps({
        "query": name, "localClosureBytes": lc, "walls": walls,
        "min_rebuild": min(walls[1:]) if len(walls) > 1 else walls[0],
        "rows": n, "shuffle_mb_last_run": sh_last,
    }))


if __name__ == "__main__":
    main()
