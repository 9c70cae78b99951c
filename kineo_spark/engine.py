"""User-facing engine facade: SPARQL text in, results out.

The analog of the reference's embedding API
(``store.query(q, defaultGraph:)``, QuadStore.swift:295-300 →
SimpleQueryEvaluator / QueryPlanEvaluator): parse → rewrite → compile →
execute, with the three result shapes (``QueryResult``:
boolean | bindings | triples, QuadStore.swift:365-380).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.forms import ask, construct, describe, select
from kineo_spark.rewrite import rewrite
from kineo_spark.sparql_parser import parse_query
from kineo_spark.store import QuadStore


@dataclass
class QueryResult:
    form: str                           # "select" | "ask" | "triples"
    bindings: Optional[DataFrame] = None
    boolean: Optional[bool] = None
    triples: Optional[DataFrame] = None


class Engine:
    def __init__(self, store: QuadStore):
        self.store = store
        self.compiler = Compiler(store)

    def query(self, sparql: str) -> QueryResult:
        q = parse_query(sparql)
        return self.evaluate(q)

    def evaluate(self, q) -> QueryResult:
        if getattr(q, "dataset", ()):
            # FROM / FROM NAMED: evaluate against a store scoped to
            # exactly the described dataset (SPARQL 1.1 §13.2)
            from kineo_spark.store import DatasetGraphStore

            defaults, named = q.dataset
            scoped = Engine(DatasetGraphStore(self.store, defaults, named))
            import dataclasses
            return scoped.evaluate(dataclasses.replace(q, dataset=()))
        if isinstance(q, A.SelectQuery):
            q = A.SelectQuery(rewrite(q.algebra), q.variables)
            return QueryResult("select", bindings=select(self.compiler, q))
        if isinstance(q, A.AskQuery):
            return QueryResult("ask", boolean=ask(self.compiler, A.AskQuery(rewrite(q.algebra))))
        if isinstance(q, A.ConstructQuery):
            q = A.ConstructQuery(rewrite(q.algebra), q.template)
            return QueryResult("triples", triples=construct(self.compiler, q))
        if isinstance(q, A.DescribeQuery):
            return QueryResult("triples", triples=describe(self.compiler, q))
        raise ValueError(f"unsupported query form {type(q).__name__}")

    def query_simple(self, dsl: str) -> QueryResult:
        """Evaluate a query in the reference's line-oriented stack DSL
        (SimpleParser/QueryParser.swift:12-288) — see
        kineo_spark.simple_parser for the grammar."""
        from kineo_spark.simple_parser import parse_simple_query

        return self.evaluate(parse_simple_query(dsl))

    def explain(self, sparql: str, mode: str = "formatted") -> str:
        """Parsed algebra + rewritten algebra + Catalyst plan (the analog
        of ``kineo explain``, kineo-cli/main.swift:275-333)."""
        from kineo_spark.explain import explain as _explain

        return _explain(self, sparql, mode)

    def serialize(self, result: QueryResult, accept: str = "application/sparql-results+json") -> str:
        from kineo_spark import serializers as ser

        if result.form == "ask":
            return ser.ask_to_sparql_json(result.boolean)
        _, f = ser.negotiate(accept)
        return f(result.bindings if result.form == "select" else result.triples)
