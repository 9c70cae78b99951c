"""Local t2-style correctness checker: run every queries() entry and its
oracle_sql() twin, compare row count + sorted-column value multisets.

Usage: python tools/check_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, round
    floats, stringify, sort rows."""
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            x = r[i]
            if isinstance(x, float):
                # full precision (shortest round-trip repr): %.6g here masked
                # a real ±1µs nanos-division bug in round 1 — never round in
                # the local checker, the driver's hash compare doesn't.
                x = repr(x)
            vals.append(str(x))
        out.append("".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    import __spark_entry__ as entry
    from kineo_spark.session import get_spark

    spark = get_spark("check-oracle", cpus=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, f in qs.items():
        if filters and not any(s in name for s in filters):
            continue
        t0 = time.time()
        try:
            df = f(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(cols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(rows)} != {len(orows)}")
            n_fail += 1
            continue
        a, b = canon(rows, cols), canon(orows, ocols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(rows)} rows ({dt:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
