"""Additional quad stores: Parquet-persistent and remote-endpoint.

Reference analogs:
- ``ParquetQuadStore`` ↔ the persistent stores (SQLiteQuadStore.swift,
  DiomedeQuadStore.swift): our durable layout is parquet files of the
  flat FIXTURES §0 quads schema, partitioned by graph and sorted by
  (p_lex, s_lex) within files so predicate-bound scans prune row groups
  (the analog of the reference's spog/gpso index orders,
  QuadStore.swift:62-88). Append-only load, like the reference's
  ``load(version:quads:)`` (QuadStore.swift:141-144).
- ``SparqlEndpointStore`` ↔ SPARQLClientQuadStore.swift:12-216: every
  pattern scan becomes a remote SPARQL query; results land in a (small)
  local DataFrame that Catalyst will typically broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kineo_spark import algebra as A
from kineo_spark.model import PyTerm
from kineo_spark.store import QuadsDataFrameStore, QuadStore


class ParquetQuadStore(QuadsDataFrameStore):
    def __init__(self, spark: SparkSession, path: str):
        self.path = path
        super().__init__(spark, spark.read.parquet(path))

    @classmethod
    def create(cls, spark: SparkSession, quads: DataFrame, path: str) -> "ParquetQuadStore":
        (
            quads.repartition("g_lex")
            .sortWithinPartitions("p_lex", "s_lex")
            .write.mode("overwrite")
            .partitionBy("g_lex")
            .parquet(path)
        )
        return cls(spark, path)

    def load(self, quads: DataFrame) -> "ParquetQuadStore":
        """Append-only bulk load; re-open to see the new data."""
        quads.repartition("g_lex").sortWithinPartitions("p_lex", "s_lex") \
            .write.mode("append").partitionBy("g_lex").parquet(self.path)
        return ParquetQuadStore(self.spark, self.path)


class SparqlEndpointStore(QuadStore):
    """Pattern scans against a remote SPARQL endpoint. Driver-side HTTP
    (one call per pattern), like the reference client store — useful for
    federation of small remote graphs, not a bulk path."""

    def __init__(self, spark: SparkSession, endpoint: str):
        self.spark = spark
        self.endpoint = endpoint

    def _pattern_sparql(self, pattern: A.QuadPattern) -> str:
        def n(node, name):
            if isinstance(node, PyTerm):
                return node.n3()
            return f"?{name}"

        s, p, o = n(pattern.s, "s"), n(pattern.p, "p"), n(pattern.o, "o")
        if isinstance(pattern.g, A.Var) and not pattern.g.binding:
            return f"SELECT * WHERE {{ {s} {p} {o} }}"
        g = n(pattern.g, "g")
        return f"SELECT * WHERE {{ GRAPH {g} {{ {s} {p} {o} }} }}"

    def scan(self, pattern: A.QuadPattern) -> DataFrame:
        from pyspark.sql import types as T

        from kineo_spark.model import TERM_SCHEMA
        from kineo_spark.service import fetch_bindings

        variables, rows = fetch_bindings(self.endpoint, self._pattern_sparql(pattern))
        # map positional ?s/?p/?o/?g back to the pattern's variable names
        name_of = {}
        for pos, node in pattern.nodes():
            if isinstance(node, A.Var) and node.binding:
                name_of[pos[0] if pos != "g" else "g"] = node.name
        out_vars, idx = [], []
        for i, v_ in enumerate(variables):
            if v_ in name_of:
                out_vars.append(name_of[v_])
                idx.append(i)
        schema = T.StructType([T.StructField(v_, TERM_SCHEMA) for v_ in out_vars])
        data = [tuple(r[i] for i in idx) for r in rows]
        return self.spark.createDataFrame(data, schema)

    def quads(self) -> DataFrame:
        return self.scan(
            A.QuadPattern(A.Var("s"), A.Var("p"), A.Var("o"), A.Var("g"))
        )
