"""The ε-band driver-contract convention (README "ε-band convention"):
approximate-sketch queries hash-check the EXACT value plus a boolean
band flag, with the oracle twin returning the flag as constant TRUE —
so the hash pins the band, never the engine-specific estimate. These
tests pin BOTH directions: a violating estimate flips the flag (hash
would diverge), and the real sketches sit inside their bands."""

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_band_violation_flips_flag(spark):
    """A sketch 11% off exact must flip within_eps (ε = 5%) — the
    failure mode the convention exists to catch. Same expression shape
    as pipe_distinct_sketch / sparql_approx_count_distinct."""
    df = spark.createDataFrame(
        [(100, 90), (100, 96)], "approx long, exact long"
    ).select(
        "exact",
        (F.abs(F.col("approx") - F.col("exact"))
         <= 0.05 * F.col("exact")).alias("within_eps"))
    got = {r.exact: r.within_eps for r in df.collect()}
    assert got == {90: False, 96: True}


@pytest.mark.parametrize("name,flag_cols", [
    ("sparql_approx_count_distinct", ["within_eps"]),
    ("pipe_distinct_sketch", ["within_eps"]),
    ("pipe_len_quantile_sketch", ["ok50", "ok90", "ok99"]),
])
def test_sketches_inside_band_and_oracle_schema(spark, name, flag_cols):
    """The three ε-band entries: every band flag is True on real data,
    and the DuckDB oracle twin yields the same columns with the flag
    constant TRUE — so the driver's hash compare pins exactly the band
    and cannot silently tighten into comparing raw estimates."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        for c in flag_cols:
            assert r[c] is True, f"{name}.{c} outside ε-band: {r}"

    sql = entry.oracle_sql()[name]
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    ora = con.execute(sql).fetchdf()
    assert sorted(ora.columns) == sorted(df.columns)
    for c in flag_cols:
        assert ora[c].all()
