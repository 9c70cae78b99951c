"""SPARQL 1.1 Update evaluator (EXTENSION).

The reference DECLARES update support (`SPARQL/Query.swift:25`
``sparqlUpdate11``) but no evaluator accepts it — supported languages
list only query10/query11 (`QueryPlanner.swift:1075-1076`) and stores
are append-only via ``load`` (`QuadStore/QuadStore.swift:141-144`).
This module completes that surface Spark-first: every operation is a
pure quads-DataFrame → quads-DataFrame transform over the flat
FIXTURES §0 layout —

- INSERT DATA / LOAD  → union + set-dedup,
- DELETE DATA         → left_anti on the full quad key,
- DELETE/INSERT WHERE → compile the WHERE once against the PRE-state
  with the ordinary query compiler, instantiate both template sets from
  the SAME bindings, apply deletes then inserts (W3C sparql11-update
  §3.1.3 semantics),
- CLEAR/DROP          → graph-partition filter.

Scale notes: every step is declarative (no driver-side row loops);
deletes are hash anti-joins on the quad key; ``GraphStore`` bounds
lineage with an eager localCheckpoint per operation — on a real cluster
the same transforms rewrite only the affected graph partitions of a
parquet layout (graph-partitioned like ParquetQuadStore).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.model import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    PyTerm,
    QUADS_SCHEMA,
    term_struct,
)
from kineo_spark.rewrite import rewrite
from kineo_spark.sparql_parser import parse_update
from kineo_spark.store import QuadsDataFrameStore

DEFAULT_GRAPH = "urn:g:default"

_FLAT = [f.name for f in QUADS_SCHEMA.fields]


def _ground_rows(quads, default_graph: str) -> list[tuple]:
    rows = []
    for tp, g in quads:
        g_lex = g.lex if isinstance(g, PyTerm) else default_graph
        rows.append((
            tp.s.kind, tp.s.lex, tp.p.lex,
            tp.o.kind, tp.o.lex, tp.o.dt, tp.o.lang, tp.o.num, g_lex,
        ))
    return rows


def _union_set(quads: DataFrame, new: DataFrame) -> DataFrame:
    """Graph-store set semantics: union then full-quad dedup."""
    return quads.unionByName(new).dropDuplicates(_FLAT)


def _anti(quads: DataFrame, dels: DataFrame) -> DataFrame:
    """Remove exact quad matches (null-safe on every field)."""
    d = dels.select(*[F.col(c).alias(f"__d_{c}") for c in _FLAT]).dropDuplicates()
    cond = None
    for c in _FLAT:
        eq = quads[c].eqNullSafe(d[f"__d_{c}"])
        cond = eq if cond is None else (cond & eq)
    return quads.join(d, cond, "left_anti")


def _instantiate(
    bindings: DataFrame, templates, default_g_lex: str
) -> DataFrame | None:
    """Template quads × solution rows → flat quads (CONSTRUCT-style,
    QueryPlanner.swift:1181-1199): rows with an unbound template var, a
    literal subject, or a non-IRI predicate/graph produce nothing;
    template blank nodes are fresh per solution row."""
    if not templates:
        return None
    row_cols = [bindings[c] for c in bindings.columns]
    row_hash = (
        F.conv(F.xxhash64(*row_cols).cast("string"), 10, 16)
        if row_cols else F.lit("0")
    )

    def term_col(node) -> Column | None:
        if isinstance(node, A.Var):
            if node.name not in bindings.columns:
                return None
            return bindings[node.name]
        if isinstance(node, PyTerm) and node.kind == KIND_BLANK:
            return term_struct(
                F.lit(KIND_BLANK).cast("tinyint"),
                F.concat(F.lit(node.lex + "-r"), row_hash),
                F.lit(None).cast("string"), F.lit(None).cast("string"),
                F.lit(None).cast("double"),
            )
        return node.as_column()

    parts: list[DataFrame] = []
    for tp, g in templates:
        s, p, o = term_col(tp.s), term_col(tp.p), term_col(tp.o)
        if s is None or p is None or o is None:
            continue  # unbindable var: the template yields no quads
        if isinstance(g, A.Var):
            if g.name not in bindings.columns:
                continue
            gc = bindings[g.name]
            g_lex, g_ok = gc["lex"], gc.isNotNull() & (gc["kind"] == KIND_IRI)
        elif isinstance(g, PyTerm):
            g_lex, g_ok = F.lit(g.lex), F.lit(True)
        else:
            g_lex, g_ok = F.lit(default_g_lex), F.lit(True)
        ok = (
            s.isNotNull() & (s["kind"] != KIND_LITERAL)
            & p.isNotNull() & (p["kind"] == KIND_IRI)
            & o.isNotNull() & g_ok
        )
        parts.append(bindings.filter(ok).select(
            s["kind"].alias("s_kind"), s["lex"].alias("s_lex"),
            p["lex"].alias("p_lex"),
            o["kind"].alias("o_kind"), o["lex"].alias("o_lex"),
            o["dt"].alias("o_dt"), o["lang"].alias("o_lang"),
            o["num"].alias("o_num"), g_lex.alias("g_lex"),
        ))
    if not parts:
        return None
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _load_source(spark: SparkSession, op: A.LoadOp, default_graph: str) -> DataFrame:
    path = op.source
    if path.startswith("file://"):
        path = path[len("file://"):]
    graph = op.graph.lex if op.graph is not None else default_graph
    from kineo_spark.sources import load_rdf

    return load_rdf(spark, path, default_graph=graph)


def apply_op(
    spark: SparkSession, quads: DataFrame, op,
    default_graph: str = DEFAULT_GRAPH, key_bits: int | None = None,
) -> DataFrame:
    """One update operation over the current quads state → new state.

    ``key_bits``: None evaluates Modify WHERE clauses with the term
    compiler; 64/128 route them through the dictionary compiler (ids in
    the joins, terms materialized for the template variables — the same
    id-mode contract queries get). Template instantiation always sees
    term structs either way."""
    if isinstance(op, A.InsertData):
        new = spark.createDataFrame(
            _ground_rows(op.quads, default_graph), QUADS_SCHEMA)
        return _union_set(quads, new)
    if isinstance(op, A.DeleteData):
        dels = spark.createDataFrame(
            _ground_rows(op.quads, default_graph), QUADS_SCHEMA)
        return _anti(quads, dels)
    if isinstance(op, A.Modify):
        store = QuadsDataFrameStore(spark, quads)
        if op.dataset:
            # USING / USING NAMED scope the WHERE evaluation (§3.1.5.3)
            from kineo_spark.store import DatasetGraphStore

            store = DatasetGraphStore(store, *op.dataset)
        if key_bits is None:
            comp = Compiler(store)
        else:
            from kineo_spark.dictionary import id_compiler
            # no prepare(): the materialization frontier defaults to
            # "every var" — templates may read any WHERE variable
            comp = id_compiler(store, key_bits=key_bits)
        bindings = comp.compile(rewrite(op.where), op.with_graph).df
        tmpl_g = op.with_graph.lex if op.with_graph is not None else default_graph
        dels = _instantiate(bindings, op.delete, tmpl_g)
        ins = _instantiate(bindings, op.insert, tmpl_g)
        out = quads
        if dels is not None:
            out = _anti(out, dels)
        if ins is not None:
            out = _union_set(out, ins)
        return out
    if isinstance(op, A.Clear):
        t = op.target
        if t == "ALL":
            return spark.createDataFrame([], QUADS_SCHEMA)
        if t == "DEFAULT":
            return quads.filter(F.col("g_lex") != default_graph)
        if t == "NAMED":
            return quads.filter(F.col("g_lex") == default_graph)
        return quads.filter(F.col("g_lex") != t.lex)
    if isinstance(op, A.Create):
        return quads  # graphs exist implicitly in the quads layout
    if isinstance(op, A.GraphMgmt):
        # graphs exist implicitly in the quads layout, so an empty source
        # copies/moves nothing (Create is a no-op for the same reason)
        lex = lambda x: default_graph if x == "DEFAULT" else x.lex  # noqa: E731
        src_g, dst_g = lex(op.src), lex(op.dst)
        if src_g == dst_g:
            return quads
        moved = quads.filter(F.col("g_lex") == src_g).withColumn(
            "g_lex", F.lit(dst_g))
        keep = quads.filter(F.col("g_lex") != dst_g)
        if op.op == "ADD":
            return _union_set(quads, moved)
        if op.op == "MOVE":
            keep = keep.filter(F.col("g_lex") != src_g)
        return _union_set(keep, moved)
    if isinstance(op, A.LoadOp):
        try:
            return _union_set(quads, _load_source(spark, op, default_graph))
        except Exception:
            if op.silent:
                return quads
            raise
    raise NotImplementedError(f"update op {type(op).__name__}")


class GraphStore:
    """Mutable graph-store facade over an immutable quads DataFrame
    (the SPARQL 1.1 'Graph Store'): ``update()`` applies a parsed or
    textual update request, ``query()`` runs SPARQL over the current
    state via the ordinary Engine. Each operation's result is eagerly
    localCheckpoint-ed so repeated updates don't grow an unbounded
    lineage."""

    def __init__(self, spark: SparkSession, quads_df: DataFrame | None = None,
                 default_graph: str = DEFAULT_GRAPH,
                 key_bits: int | None = None):
        self.spark = spark
        self.default_graph = default_graph
        self.key_bits = key_bits  # None = term-mode WHERE, 64/128 = ids
        self._df = (quads_df if quads_df is not None
                    else spark.createDataFrame([], QUADS_SCHEMA))

    @property
    def quads(self) -> DataFrame:
        return self._df

    def store(self) -> QuadsDataFrameStore:
        return QuadsDataFrameStore(self.spark, self._df)

    def query(self, sparql: str):
        from kineo_spark.engine import Engine
        return Engine(self.store()).query(sparql)

    def update(self, request) -> "GraphStore":
        ops = parse_update(request) if isinstance(request, str) else list(request)
        for op in ops:
            self._df = apply_op(
                self.spark, self._df, op, self.default_graph,
                key_bits=self.key_bits,
            ).localCheckpoint(eager=True)
        return self
