"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check at sf0.001.
queries()       — every implemented operator, (spark, sf_dir) → DataFrame.
oracle_sql()    — DuckDB twin SQL per query. Since r8 EVERY entry has
                  one: the hashing-dependent operators (MinHash-LSH,
                  SimHash, hyperplane ANN) replicate the engine hashing
                  in SQL, the approximate sketches hash ε-band flags
                  (README, driver contract), and the learned quality
                  classifier scores frozen integer coefficients its
                  oracle embeds verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-hop BGP join
    (customer→nation→region) + typed filter + order, through the full
    SPARQL-algebra → Catalyst stack."""
    from kineo_spark.session import tune

    tune(spark)
    from kineo_spark.queries_sparql import QUERIES as SQ

    return SQ["sparql_bgp_3hop_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kineo_spark.session import tune
    from kineo_spark import (
        queries_idmode, queries_more, queries_pipeline, queries_sparql, queries_text,
    )

    out: dict[str, Callable] = {}
    merged = {
        **queries_sparql.QUERIES, **queries_pipeline.QUERIES, **queries_more.QUERIES,
        **queries_text.QUERIES, **queries_idmode.QUERIES,
    }
    for name, f in merged.items():
        def wrapper(spark, sf_dir, _f=f):
            tune(spark)
            return _f(spark, sf_dir)
        out[name] = wrapper
    return out


def oracle_sql() -> dict[str, str]:
    from kineo_spark import (
        queries_idmode, queries_more, queries_pipeline, queries_sparql, queries_text,
    )

    return {
        **queries_sparql.ORACLES, **queries_pipeline.ORACLES, **queries_more.ORACLES,
        **queries_text.ORACLES, **queries_idmode.ORACLES,
    }
