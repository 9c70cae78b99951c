"""EXISTS in expression position (mark-join decorrelation).

SPARQL 1.1 §17.4.1.4 makes EXISTS a BuiltInCall — legal anywhere an
expression appears (BIND, IF, &&/||), not just as the whole FILTER
condition. The reference only ever plans the FILTER form (ExistsPlan,
MaterializedQueryPlan.swift:1617-1660); the general form here is
Compiler._mark_exists: semi/anti partition the child bag, re-union with
a boolean marker, and the expression reads the marker column.
"""

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.engine import Engine
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"


def _store(spark):
    rows = [
        (0, EX + "g1", EX + "k", 2, "a", "string", None, None, "g"),
        (0, EX + "g1", EX + "v", 2, "1", "integer", None, 1.0, "g"),
        (0, EX + "g2", EX + "k", 2, "b", "string", None, None, "g"),
        (0, EX + "g2", EX + "v", 2, "3", "integer", None, 3.0, "g"),
        (0, EX + "g3", EX + "k", 2, "c", "string", None, None, "g"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def _q(spark, sparql):
    eng = Engine(_store(spark))
    return [r.asDict() for r in eng.query(sparql).bindings.collect()]


def test_exists_in_bind_yields_boolean_terms(spark):
    rows = _q(spark, """
      PREFIX ex: <http://example.org/>
      SELECT ?g ?has WHERE { ?g ex:k ?kk BIND(EXISTS { ?g ex:v ?v } AS ?has) }
    """)
    got = {r["g"]["lex"]: r["has"]["lex"] for r in rows}
    assert got == {EX + "g1": "true", EX + "g2": "true", EX + "g3": "false"}
    assert all(r["has"]["dt"] == "boolean" for r in rows)


def test_exists_conjoined_in_filter(spark):
    rows = _q(spark, """
      PREFIX ex: <http://example.org/>
      SELECT ?g WHERE { ?g ex:k ?kk FILTER(EXISTS { ?g ex:v ?v } && ?kk != "a") }
    """)
    assert [r["g"]["lex"] for r in rows] == [EX + "g2"]


def test_not_exists_in_if(spark):
    rows = _q(spark, """
      PREFIX ex: <http://example.org/>
      SELECT ?g ?lab WHERE {
        ?g ex:k ?kk BIND(IF(NOT EXISTS { ?g ex:v ?v }, "empty", "has") AS ?lab)
      }
    """)
    got = {r["g"]["lex"]: r["lab"]["lex"] for r in rows}
    assert got == {EX + "g1": "has", EX + "g2": "has", EX + "g3": "empty"}


def test_two_exists_in_one_filter(spark):
    rows = _q(spark, """
      PREFIX ex: <http://example.org/>
      SELECT ?g WHERE { ?g ex:k ?kk FILTER(EXISTS { ?g ex:v 1 } || EXISTS { ?g ex:v 3 }) }
    """)
    assert sorted(r["g"]["lex"] for r in rows) == [EX + "g1", EX + "g2"]


def test_marker_columns_do_not_leak(spark):
    eng = Engine(_store(spark))
    df = eng.query("""
      PREFIX ex: <http://example.org/>
      SELECT * WHERE { ?g ex:k ?kk BIND(EXISTS { ?g ex:v ?v } AS ?has) }
    """).bindings
    assert not [c for c in df.columns if c.startswith("__")]


def test_filter_top_level_exists_keeps_single_join_fast_path(spark):
    """The bare FILTER EXISTS form must still plan as ONE semi join,
    not the two-join mark union."""
    store = _store(spark)
    comp = Compiler(store)
    from kineo_spark.sparql_parser import parse_query
    q = parse_query("""
      PREFIX ex: <http://example.org/>
      SELECT ?g WHERE { ?g ex:k ?kk FILTER EXISTS { ?g ex:v ?v } }
    """)
    from kineo_spark.rewrite import rewrite
    from kineo_spark.forms import select
    df = select(comp, A.SelectQuery(rewrite(q.algebra), q.variables))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 1
    assert "Union" not in plan
