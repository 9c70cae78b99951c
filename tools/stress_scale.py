"""Scale-stress harness: generate a seeded Nx corpus (vs sf0.1, N =
$STRESS_REPLICAS, default 10) and re-measure the shuffle-heaviest
headline queries at 1x and Nx, so SCALE.md's linear-shuffle predictions
become MEASURED numbers.

  python tools/stress_scale.py generate   # write stressdata/xN
  python tools/stress_scale.py run        # measure 1x vs Nx, print table
  STRESS_REPLICAS=100 python tools/stress_scale.py generate  # 2-decade run

Generation is deterministic (pure-Column transforms of the sf0.1 seed
tables — no RNG, so re-runs are bit-identical):

- documents: 10 replicas; replica r suffixes every 3rd token with "xr".
  The transformation is a per-replica token bijection, so WITHIN a
  replica the seed corpus's planted near-duplicate structure is
  preserved exactly, while ACROSS replicas every shingle containing a
  perturbed token differs — replicas are not near-dups of each other
  (verified: cross-replica verified-pair count is 0). Dedup workload
  character therefore scales, not degenerates.
- customer/orders: 10 replicas with key offsets (r*1e8) keeping FK
  consistency; nation/region shared (they are closure sinks via the
  fk edges, so the path closure scales linearly, no hub blowup).
- remaining tables copied 1x (the measured queries do not touch them).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED_DIR = os.environ.get("STRESS_SEED_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("STRESS_REPLICAS", "10"))
OUT_DIR = os.environ.get(
    "STRESS_OUT_DIR", f"/root/repo/stressdata/x{REPLICAS}")
KOFF = 100_000_000

QUERIES = [
    "pipe_dedup_minhash_lsh",
    "sparql_path_alt_plus",
    "sparql_id_path_alt_plus",
    "pipe_dedup_ngram_jaccard",
    "pipe_winnow_fingerprints",
    "pipe_tfidf_top_terms",
    # r6 widening: positioned k-gram span dedup (documents scale with
    # replicas) and the flagship 3-hop BGP join (customer/orders scale,
    # nation/region stay shared sinks)
    "pipe_exact_substring_spans",
    "sparql_bgp_3hop_join",
    # r7: RDF-star at corpus scale — the annotation store is built over
    # customer/orders (which replicate), so the s_kind=3 scan filter's
    # shuffle linearity is measured (VERDICT r6 item 6)
    "sparql_star_fk_annotation",
    # r9: per-named-graph path closure (GRAPH ?g over the cross-graph
    # FK alternation) — the newest fixpoint variant ({g, n} struct keys,
    # 32 B/row vs the 16 B longs above) at term and 128-bit widths; the
    # orders side replicates (KOFF = 1e8 is divisible by 20, so the
    # o_orderkey % 20 thinning filter scales rows exactly xN)
    "sparql_graph_path_scoped",
    "sparql_id128_graph_path_scoped",
    # r9: sequence packing — the hierarchical global-cumsum claim (16
    # ordered hash buckets, no single-partition window) measured: rows
    # and shuffle must scale linearly with the documents corpus
    "pipe_pack_sequences",
    # r9: OPTIONAL-with-filter (LeftJoin compat path): supplier stays 1×
    # (shared sink), customer replicates — the left-join family's first
    # stress row
    "sparql_optional_leftjoin",
]


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
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return 0


def generate() -> None:
    from pyspark.sql import functions as F

    spark = _spark("stress-gen")
    os.makedirs(OUT_DIR, exist_ok=True)

    def perturb(r):
        # binds r via closure — F.transform lambdas must take exactly
        # (element, index), a default arg would read as a 3-arg lambda
        return lambda t, i: F.when(
            i % 3 == F.lit(0), F.concat(t, F.lit(f"x{r}"))
        ).otherwise(t)

    docs = spark.read.parquet(f"{SEED_DIR}/documents.parquet")
    parts = [docs]
    for r in range(1, REPLICAS):
        toks = F.split(F.col("text"), " ")
        pert = F.array_join(F.transform(toks, perturb(r)), " ")
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(r * KOFF)).alias("doc_id"),
            pert.alias("text"), "lang", "source",
            F.length(pert).alias("n_chars")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{OUT_DIR}/documents.parquet")

    cust = spark.read.parquet(f"{SEED_DIR}/customer.parquet")
    c_parts = [
        cust.select(
            (F.col("c_custkey") + F.lit(r * KOFF)).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"])
        for r in range(REPLICAS)
    ]
    c = c_parts[0]
    for p in c_parts[1:]:
        c = c.unionByName(p)
    c.write.mode("overwrite").parquet(f"{OUT_DIR}/customer.parquet")

    orders = spark.read.parquet(f"{SEED_DIR}/orders.parquet")
    o_parts = [
        orders.select(
            (F.col("o_orderkey") + F.lit(r * KOFF)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(r * KOFF)).alias("o_custkey"),
            *[col for col in orders.columns if col not in ("o_orderkey", "o_custkey")])
        for r in range(REPLICAS)
    ]
    o = o_parts[0]
    for p in o_parts[1:]:
        o = o.unionByName(p)
    o.write.mode("overwrite").parquet(f"{OUT_DIR}/orders.parquet")

    for t in ("region", "nation", "supplier", "part", "lineitem",
              "events", "embeddings"):
        src = f"{SEED_DIR}/{t}.parquet"
        dst = f"{OUT_DIR}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    spark.stop()
    print(json.dumps({"generated": OUT_DIR, "replicas": REPLICAS}))


def run() -> None:
    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = _spark("stress-run")
    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("1x", SEED_DIR), (f"{REPLICAS}x", OUT_DIR)):
        for name in QUERIES:
            fn = qs[name]
            best, rows, sw = None, None, None
            for probe in range(2):
                sw0 = _shuffle_write_bytes(spark)
                t0 = time.time()
                rows = fn(spark, sf_dir).count()
                dt = time.time() - t0
                sw = _shuffle_write_bytes(spark) - sw0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[sf_name] = {
                "sec": round(best, 2), "rows": rows,
                "shuffle_mb": round(sw / 1e6, 2)}
            print(f"{sf_name:>4} {name}: {best:.2f}s {rows} rows "
                  f"{sw / 1e6:.1f} MB shuffle", file=sys.stderr)
    spark.stop()
    print(json.dumps(results))
    # markdown table for SCALE.md
    n = f"{REPLICAS}x"
    print(f"\n| Query | 1x sec | {n} sec | 1x shuffle MB | {n} shuffle MB "
          f"| 1x rows | {n} rows | scaling |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in results.items():
        a, b = r["1x"], r[f"{REPLICAS}x"]
        ratio = b["shuffle_mb"] / a["shuffle_mb"] if a["shuffle_mb"] else float("nan")
        print(f"| {name} | {a['sec']} | {b['sec']} | {a['shuffle_mb']} "
              f"| {b['shuffle_mb']} | {a['rows']} | {b['rows']} "
              f"| shuffle x{ratio:.1f} |")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    {"generate": generate, "run": run}[cmd]()
