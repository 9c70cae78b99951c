"""Local t2-style correctness checker: run every queries() entry and its
oracle_sql() twin, compare row count + sorted-column value multisets.

Round 4: the compare is TYPED, matching the driver's hash semantics. The
oracle result is fetched as an Arrow table and each column's type family is
compared against the Spark schema; any DuckDB column that Arrow surfaces as
HUGEINT / DECIMAL(38,0) / uint64 is an automatic FAIL ("uncast aggregate —
wrap CAST(... AS BIGINT)"), because pandas coerces those lossily and the
driver's value hash diverges even when str() values agree. This is exactly
the r3 pipe_events_props_agg / pipe_token_budget failure mode.

Usage: python tools/check_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def _arrow_family(t):
    """Normalize an Arrow type to a comparison family. HUGEINT-ish types
    (int128 → decimal128(38,0), uint64) get their own 'UNCAST' marker."""
    import pyarrow as pa

    s = str(t)
    if pa.types.is_decimal(t):
        if t.precision > 18:
            return "UNCAST"  # DuckDB HUGEINT / SUM(BIGINT) — cast it
        return f"decimal({t.precision},{t.scale})"
    if s == "uint64":
        return "UNCAST"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + _arrow_family(t.value_type) + ">"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    return s


def _spark_family(dt):
    """Normalize a Spark DataType to the same family vocabulary."""
    s = dt.simpleString()
    if s.startswith("decimal("):
        return s.replace("decimal(", "decimal(")
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "boolean":
        return "bool"
    if s == "string":
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("array<"):
        import pyspark.sql.types as T

        return "list<" + _spark_family(dt.elementType) + ">"
    if s == "binary":
        return "bytes"
    return s


def type_check(name, spark_schema, arrow_schema):
    """Return a list of typed-compare problems (empty = clean)."""
    probs = []
    sfam = {f.name: _spark_family(f.dataType) for f in spark_schema.fields}
    for field in arrow_schema:
        ofam = _arrow_family(field.type)
        if ofam == "UNCAST":
            probs.append(
                f"oracle col '{field.name}' is {field.type} "
                f"(uncast HUGEINT/DECIMAL — wrap CAST(... AS BIGINT))"
            )
            continue
        if field.name in sfam and sfam[field.name] != ofam:
            probs.append(
                f"col '{field.name}' type family: spark={sfam[field.name]} "
                f"oracle={ofam}"
            )
    return probs


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
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.column_names
            orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        probs = type_check(name, df.schema, tbl.schema)
        if probs:
            print(f"FAIL  {name}: typed compare: {'; '.join(probs)}")
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
