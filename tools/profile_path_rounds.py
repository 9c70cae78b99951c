"""Per-round wall breakdown of the path-closure fixpoint for one bench
entry (default sparql_path_alt_plus). Wraps the round primitives with
timers to attribute each round's wall to (a) plan construction +
Catalyst work in the count job vs (b) everything else, and prints the
round count. Diagnostic only — not part of the bench contract.

Usage: python tools/profile_path_rounds.py [entry] [--runs 2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry_name = sys.argv[1] if len(sys.argv) > 1 else "sparql_path_alt_plus"
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    import __spark_entry__ as entry
    from kineo_spark import paths
    from kineo_spark.session import get_spark

    spark = get_spark("kineo-path-profile")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry.queries()
    f = qs[entry_name]
    spark.range(1).count()

    orig_anti = paths._anti_new
    orig_extend = paths._extend_acc
    log: list[tuple[str, float]] = []

    def timed_anti(*a, **kw):
        t0 = time.time()
        r = orig_anti(*a, **kw)
        log.append(("anti_build", time.time() - t0))
        r_count = r.count

        def counted():
            t1 = time.time()
            n = r_count()
            log.append(("count_job", time.time() - t1))
            return n

        r.count = counted
        return r

    def timed_extend(*a, **kw):
        t0 = time.time()
        r = orig_extend(*a, **kw)
        log.append(("extend", time.time() - t0))
        return r

    paths._anti_new = timed_anti
    paths._extend_acc = timed_extend

    # also time each count() call on checkpointed deltas by wrapping
    # DataFrame.count is too broad; instead wrap _closure_pairs rounds via
    # rounds_out plus wall bracketing of the whole query.
    for i in range(runs):
        log.clear()
        t0 = time.time()
        df = f(spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        n = df.count()
        t_exec = time.time() - t1
        anti = [d for k, d in log if k == "anti_build"]
        cnt = [d for k, d in log if k == "count_job"]
        ext = [d for k, d in log if k == "extend"]
        print(f"run {i}: build={t_build:.3f}s exec={t_exec:.3f}s rows={n} "
              f"rounds={len(anti)} anti_build_sum={sum(anti):.3f}s "
              f"({', '.join(f'{d:.3f}' for d in anti)}) "
              f"count_jobs_sum={sum(cnt):.3f}s "
              f"({', '.join(f'{d:.3f}' for d in cnt)}) "
              f"extend_sum={sum(ext):.3f}s")


if __name__ == "__main__":
    main()
