"""Three-decade dedup scale stress: MinHash-LSH and exact-substring
spans at 1x / 10x / 100x documents (VERDICT r11 #5).

SCALE.md's 100 TB claims for these two operators — MinHash's
O(docs·k·8B) signature shuffle with a banded equi-join (never
all-pairs), and exact-substring's positioned k-gram equi-join +
gaps-and-islands — were plan-audited but only measured to 10x. This
harness measures wall + shuffle-write bytes across THREE decades so
near-linear shuffle is a recorded number, not an extrapolation.

Corpus: the same deterministic per-replica token bijection as
tools/stress_scale.py (replica r suffixes every 3rd token with "xr"),
so each replica preserves the seed's planted near-duplicate structure
while replicas are not near-dups of each other — the dedup workload
scales in character, not just bytes. 1x = sf0.1 seed, 10x =
stressdata/x10 (stress_scale), 100x = stressdata/x100docs
(documents-only, generated here; the two queries read only documents).

Run:  python tools/stress_dedup_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED_DIR = os.environ.get("STRESS_SEED_DIR", "/root/testdata/sf0.1")
X10_DIR = "/root/repo/stressdata/x10"
X100_DIR = "/root/repo/stressdata/x100docs"
KOFF = 100_000_000

QUERIES = ["pipe_dedup_minhash_lsh", "pipe_exact_substring_spans"]


def _spark(name: str):
    os.environ.setdefault("KINEO_UI", "1")
    from kineo_spark import get_spark
    spark = get_spark(name, cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _shuffle_write_bytes(spark) -> int:
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return 0


def _gen_x100_documents(spark) -> None:
    """documents-only 100x replica set (same bijection as stress_scale)."""
    from pyspark.sql import functions as F

    if os.path.isdir(f"{X100_DIR}/documents.parquet"):
        return

    def perturb(r):
        return lambda t, i: F.when(
            i % 3 == F.lit(0), F.concat(t, F.lit(f"x{r}"))
        ).otherwise(t)

    docs = spark.read.parquet(f"{SEED_DIR}/documents.parquet")
    parts = [docs]
    for r in range(1, 100):
        toks = F.split(F.col("text"), " ")
        pert = F.array_join(F.transform(toks, perturb(r)), " ")
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(r * KOFF)).alias("doc_id"),
            pert.alias("text"), "lang", "source",
            F.length(pert).alias("n_chars")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite") \
        .parquet(f"{X100_DIR}/documents.parquet")


def main() -> None:
    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = _spark("stress-dedup-scale")
    _gen_x100_documents(spark)

    # Two regimes per (query, scale):
    # - "auto": production config — AQE broadcasts whatever fits, so
    #   small scales shuffle almost nothing and the decade RATIOS read
    #   as the broadcast→shuffle crossover, not as work growth.
    # - "noBcast": broadcast joins disabled — every scale pays the same
    #   join strategy, so the decade ratios measure the operator's true
    #   shuffle growth. This is the regime that holds at 100 TB, where
    #   only genuinely small dims are broadcastable.
    results: dict[str, dict] = {}
    for regime in ("auto", "noBcast"):
        if regime == "noBcast":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for sf_name, sf_dir in (("1x", SEED_DIR), ("10x", X10_DIR),
                                ("100x", X100_DIR)):
            for name in QUERIES:
                fn = qs[name]
                best, rows, sw = None, None, None
                for _probe in range(2):
                    sw0 = _shuffle_write_bytes(spark)
                    t0 = time.time()
                    rows = fn(spark, sf_dir).count()
                    dt = time.time() - t0
                    sw = _shuffle_write_bytes(spark) - sw0
                    best = dt if best is None else min(best, dt)
                results.setdefault(name, {}).setdefault(regime, {})[sf_name] = {
                    "sec": round(best, 2), "rows": rows,
                    "shuffle_mb": round(sw / 1e6, 2)}
                print(f"{regime:>7} {sf_name:>5} {name}: {best:.2f}s "
                      f"{rows} rows {sw / 1e6:.1f} MB shuffle",
                      file=sys.stderr)

    # linearity: in the no-broadcast regime shuffle per decade should
    # grow ~10x (sub-linear fine; super-linear flags a defect)
    for name, r in results.items():
        for lo, hi in (("1x", "10x"), ("10x", "100x")):
            nb = r["noBcast"]
            ratio = (nb[hi]["shuffle_mb"] / nb[lo]["shuffle_mb"]
                     if nb[lo]["shuffle_mb"] else float("nan"))
            r[f"noBcast_shuffle_ratio_{lo}_{hi}"] = round(ratio, 2)

    out = {"metric": "dedup_scale_stress", "results": results,
           "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
