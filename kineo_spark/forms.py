"""Query forms: SELECT / ASK / CONSTRUCT / DESCRIBE (SURVEY §2.10).

Reference: form dispatch in QueryPlanner.swift:1169-1202 and DESCRIBE in
SimpleQueryEvaluation.swift:1305-1372.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler, Plan
from kineo_spark.model import PyTerm, TERM_SCHEMA


def select_plan(compiler: Compiler, q: A.SelectQuery, graph=None) -> Plan:
    plan = compiler.compile(q.algebra, graph)
    if not q.variables:
        # SELECT *: blank nodes in the query pattern are non-distinguished
        # variables (parser names them 'bn-…'; '-' cannot occur in a
        # SPARQL VARNAME, so no user collision) — never projected
        bn = [c for c in plan.df.columns if c.startswith("bn-")]
        if bn:
            keep = [c for c in plan.df.columns if not c.startswith("bn-")]
            return Plan(plan.df.select(*keep), plan.certain - set(bn),
                        plan.id_vars - set(bn))
        return plan
    cols = [
        (plan.df[v] if v in plan.df.columns else F.lit(None).cast(TERM_SCHEMA)).alias(v)
        for v in q.variables
    ]
    keep = set(q.variables)
    if (isinstance(graph, A.Var) and graph.binding
            and graph.name in plan.df.columns and graph.name not in keep):
        # subquery under GRAPH ?var: per-graph evaluation (§18.1.7)
        # keeps the active-graph column through the subquery's
        # projection — it is the carrier of "which graph produced this
        # row", consumed by the enclosing NamedGraph
        cols.append(plan.df[graph.name].alias(graph.name))
        keep.add(graph.name)
    return Plan(plan.df.select(*cols), plan.certain & keep,
                plan.id_vars & keep)


def _prepare(compiler: Compiler, q) -> None:
    # ID-mode hook: compute the lazy-materialization frontier for the
    # WHOLE query before compiling (no-op for the term-mode compiler).
    prep = getattr(compiler, "prepare", None)
    if prep is not None:
        prep(q)


def select(compiler: Compiler, q: A.SelectQuery) -> DataFrame:
    _prepare(compiler, q)
    return select_plan(compiler, q).df


def ask(compiler: Compiler, q: A.AskQuery) -> bool:
    _prepare(compiler, q)
    plan = compiler.compile(q.algebra)
    return not plan.df.limit(1).isEmpty()


def construct(compiler: Compiler, q: A.ConstructQuery) -> DataFrame:
    """Instantiate the template per solution, dedup
    (QueryPlanner.swift:1181-1199). Returns a triples DataFrame
    (s, p, o term structs)."""
    from kineo_spark.model import KIND_BLANK
    _prepare(compiler, q)
    plan = compiler.compile(q.algebra)
    df = plan.df
    # template blank nodes are fresh per solution row (the reference's
    # NextRowPlan convention, MaterializedQueryPlan.swift NextRow):
    # label = template label + row hash
    row_cols = [df[c] for c in df.columns]
    row_hash = (
        F.conv(F.xxhash64(*row_cols).cast("string"), 10, 16)
        if row_cols else F.lit("0")
    )
    parts = []
    for tp in q.template:
        cols = []
        for name, node in (("s", tp.s), ("p", tp.p), ("o", tp.o)):
            if isinstance(node, PyTerm) and node.kind == KIND_BLANK:
                from kineo_spark.model import term_struct
                lex = F.concat(F.lit(node.lex + "-r"), row_hash)
                cols.append(term_struct(
                    F.lit(KIND_BLANK).cast("tinyint"), lex,
                    F.lit(None).cast("string"), F.lit(None).cast("string"),
                    F.lit(None).cast("double"),
                ).alias(name))
            elif isinstance(node, PyTerm):
                cols.append(node.as_column().alias(name))
            else:
                cols.append(
                    (df[node.name] if node.name in df.columns else F.lit(None).cast(TERM_SCHEMA)).alias(name)
                )
        # ill-formed instantiations are skipped, not errors (SPARQL 1.1
        # §16.2: a literal subject or a non-IRI predicate drops the
        # triple; reference TriplePattern.bind semantics)
        from kineo_spark.model import KIND_IRI, KIND_LITERAL
        t = df.select(*cols).filter(
            F.col("s").isNotNull() & F.col("p").isNotNull()
            & F.col("o").isNotNull()
            & (F.col("s")["kind"] != KIND_LITERAL)
            & (F.col("p")["kind"] == KIND_IRI)
        )
        parts.append(t)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    from kineo_spark.model import term_key
    out = out.withColumn("__k", F.concat_ws("", term_key(F.col("s")), term_key(F.col("p")), term_key(F.col("o"))))
    return out.dropDuplicates(["__k"]).drop("__k")


def describe(compiler: Compiler, q: A.DescribeQuery,
             cbd: bool = False, max_depth: int = 10) -> DataFrame:
    """All triples whose subject is a described term
    (SimpleQueryEvaluation.swift:1305-1372). Constant terms use
    bound-subject scans (the store prunes to the subject's table/pk);
    variable terms semi-join the full scan against the pattern.

    ``cbd=True`` extends to the Concise Bounded Description: blank
    nodes in object position pull in their own description, iterated
    to closure (DESCRIBE's result form is implementation-defined per
    §16.4; CBD is the de-facto standard). Bnode closures are small by
    construction, so the driver-side loop converges in a handful of
    rounds; each round is one semi-join."""
    from kineo_spark.model import term_key

    parts: list[DataFrame] = []
    pv, ov = A.Var("p"), A.Var("o")
    for node in q.nodes:
        if isinstance(node, PyTerm):
            scan = compiler._scan(
                A.QuadPattern(node, pv, ov, A.Var("__dg", binding=False))
            )
            parts.append(
                scan.df.select(
                    node.as_column().alias("s"), F.col("p"), F.col("o")
                )
            )
    var_nodes = [n for n in q.nodes if isinstance(n, A.Var)]
    if var_nodes and q.algebra is not None:
        plan = compiler.compile(q.algebra)
        sv = A.Var("s")
        full = compiler._scan(A.QuadPattern(sv, pv, ov, A.Var("__dg", binding=False))).df
        for node in var_nodes:
            if node.name in plan.df.columns:
                keys = plan.df.select(
                    term_key(plan.df[node.name]).alias("__dk")
                ).dropDuplicates()
                parts.append(
                    full.join(
                        F.broadcast(keys), term_key(full["s"]) == keys["__dk"], "left_semi"
                    ).select("s", "p", "o")
                )
    if not parts:
        from kineo_spark.model import TERM_SCHEMA
        from pyspark.sql import types as T
        return compiler.spark.createDataFrame(
            [], T.StructType([T.StructField(x, TERM_SCHEMA) for x in ("s", "p", "o")])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not cbd:
        return out
    from kineo_spark.model import KIND_BLANK, term_key

    full = compiler._scan(
        A.QuadPattern(A.Var("s"), pv, ov, A.Var("__dg", binding=False))
    ).df
    seen = out.select(term_key(F.col("s")).alias("__sk")).dropDuplicates()
    frontier = out
    for _ in range(max_depth):
        bn = (
            frontier.filter(F.col("o")["kind"] == KIND_BLANK)
            .select(term_key(F.col("o")).alias("__dk"))
            .dropDuplicates()
            .join(seen, F.col("__dk") == seen["__sk"], "left_anti")
        )
        if not bn.take(1):
            break
        new = full.join(
            F.broadcast(bn), term_key(full["s"]) == bn["__dk"], "left_semi"
        ).select("s", "p", "o")
        out = out.unionByName(new)
        seen = seen.unionByName(bn.select(F.col("__dk").alias("__sk")))
        frontier = new
    return out
