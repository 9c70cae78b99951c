"""r12 optimization measurement harness.

For each headline query (bench.py HEADLINE), measure separately:
  - build_s: wall to construct the DataFrame (driver-side algebra →
    Catalyst plan construction, Python→JVM chatter) — guide §7.3
    territory, invisible in stage timelines;
  - exec_s:  best-of-N wall of the timed action. Default action matches
    bench.py (``.count()``) so numbers are comparable to BENCH_*.json;
    ``--noop`` uses the noop sink (guide §1.4) to time every column.
  - jobs/stages/shuffle bytes consumed per execution (REST API deltas)
    — attributes wall to scheduling fixed costs vs data movement.

Writes plans/<tag>/<query>_<suffix>.txt with explain("formatted") when
--plans is given, and a JSON summary to stdout/--out.

Usage: python tools/opt_measure.py [--queries a,b,c] [--runs 3]
           [--noop] [--plans plans/r12 --suffix before] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}",
                                timeout=10) as r:
        return json.load(r)


def _counters(spark):
    try:
        stages = _api(spark, "stages?status=complete")
        jobs = _api(spark, "jobs")
        return {
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
            "shuffle_mb": round(sum(s.get("shuffleWriteBytes", 0)
                                    for s in stages) / 1e6, 3),
        }
    except Exception:
        return {"jobs": -1, "stages": -1, "tasks": -1, "shuffle_mb": -1}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("KINEO_UI", "1")
    import bench
    import __spark_entry__ as entry
    from kineo_spark.session import get_spark

    spark = get_spark("kineo-opt-measure")
    qs = entry.queries()
    names = (args.queries.split(",") if args.queries else bench.HEADLINE)
    spark.range(1).count()  # warm JVM

    results: dict[str, dict] = {}
    for name in names:
        f = qs[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        try:
            t0 = time.perf_counter()
            df = f(spark, args.sf_dir)
            build_s = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"# {name}: BUILD FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = {"error": str(e)[:200]}
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        best, rows = None, None
        c0 = _counters(spark)
        per_run = []
        for i in range(args.runs):
            # re-build each run like bench.py does (the first measured
            # run above reuses the built df so plan caches stay warm)
            t0 = time.perf_counter()
            d = df if i == 0 else f(spark, args.sf_dir)
            if args.noop:
                d.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = d.count()
            dt = round(time.perf_counter() - t0, 3)
            per_run.append(dt)
            best = dt if best is None or dt < best else best
            rows = n
        c1 = _counters(spark)
        results[name] = {
            "build_s": build_s, "exec_best_s": best, "runs": per_run,
            "rows": rows,
            "jobs": c1["jobs"] - c0["jobs"],
            "stages": c1["stages"] - c0["stages"],
            "tasks": c1["tasks"] - c0["tasks"],
            "shuffle_mb": round(c1["shuffle_mb"] - c0["shuffle_mb"], 3),
        }
        print(f"# {name}: build {build_s}s exec best {best}s "
              f"({results[name]['jobs']} jobs, "
              f"{results[name]['stages']} stages, "
              f"{results[name]['tasks']} tasks, "
              f"{results[name]['shuffle_mb']} MB shuffle)", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    out = json.dumps(results, indent=1)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)
    else:
        print(out)
    spark.stop()


if __name__ == "__main__":
    main()
