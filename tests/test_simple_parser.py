"""SimpleParser DSL tests: each DSL program is evaluated next to the
equivalent SPARQL text query and must produce identical bindings
(reference SimpleParser/QueryParser.swift:12-288)."""

import pytest

from kineo_spark.engine import Engine
from kineo_spark.simple_parser import parse_expression, parse_simple_query


def _rows(res, *vars_):
    out = []
    for r in res.bindings.collect():
        out.append(tuple(None if r[v] is None else r[v]["lex"] for v in vars_))
    return sorted(out)


@pytest.fixture(scope="module")
def engine(rel_store):
    return Engine(rel_store)


def test_simple_join_filter_project(engine):
    got = engine.query_simple("""
# customers with balance over 5000
triple ?s <urn:col:customer:c_name> ?name
triple ?s <urn:col:customer:c_acctbal> ?bal
join
filter ?bal 5000 >
project ?name ?bal
""")
    want = engine.query("""
      SELECT ?name ?bal WHERE {
        ?s <urn:col:customer:c_name> ?name ;
           <urn:col:customer:c_acctbal> ?bal .
        FILTER(?bal > 5000)
      }""")
    assert _rows(got, "name", "bal") == _rows(want, "name", "bal")
    assert len(_rows(got, "name")) == 66


def test_simple_path(engine):
    got = engine.query_simple(
        "path ?c ?rname <urn:fk:customer:c_nationkey> "
        "<urn:fk:nation:n_regionkey> / <urn:col:region:r_name> /\n"
        "limit 10\n"
    )
    want = engine.query("""
      SELECT * WHERE {
        ?c <urn:fk:customer:c_nationkey>/<urn:fk:nation:n_regionkey>/
           <urn:col:region:r_name> ?rname .
      } LIMIT 10""")
    assert len(_rows(got, "c", "rname")) == len(_rows(want, "c", "rname")) == 10


def test_simple_agg_shorthand(engine):
    got = engine.query_simple("""
triple ?s <urn:fk:customer:c_nationkey> ?nat
triple ?s <urn:col:customer:c_acctbal> ?bal
join
sum ?bal ?total ?nat
""")
    want = engine.query("""
      SELECT ?nat (SUM(?bal) AS ?total) WHERE {
        ?s <urn:fk:customer:c_nationkey> ?nat ;
           <urn:col:customer:c_acctbal> ?bal .
      } GROUP BY ?nat""")
    assert _rows(got, "nat", "total") == _rows(want, "nat", "total")


def test_simple_agg_multi_and_countall(engine):
    got = engine.query_simple("""
triple ?s <urn:fk:customer:c_nationkey> ?nat
agg countall n ; ?nat
""")
    want = engine.query("""
      SELECT ?nat (COUNT(*) AS ?n) WHERE {
        ?s <urn:fk:customer:c_nationkey> ?nat .
      } GROUP BY ?nat""")
    assert _rows(got, "nat", "n") == _rows(want, "nat", "n")


def test_simple_union_leftjoin_extend(engine):
    got = engine.query_simple("""
triple ?s <urn:col:nation:n_name> ?name
triple ?s <urn:col:region:r_name> ?name
union
extend tag ?name
project ?name ?tag
""")
    want = engine.query("""
      SELECT ?name ?tag WHERE {
        { ?s <urn:col:nation:n_name> ?name }
        UNION
        { ?s <urn:col:region:r_name> ?name }
        BIND(?name AS ?tag)
      }""")
    assert _rows(got, "name", "tag") == _rows(want, "name", "tag")
    assert len(_rows(got, "name")) == 30  # 25 nations + 5 regions

    lj = engine.query_simple("""
triple ?s <urn:col:region:r_name> ?name
triple ?s <urn:col:region:r_comment> ?c
leftjoin
""")
    lw = engine.query("""
      SELECT * WHERE {
        ?s <urn:col:region:r_name> ?name
        OPTIONAL { ?s <urn:col:region:r_comment> ?c }
      }""")
    assert _rows(lj, "name", "c") == _rows(lw, "name", "c")


def test_simple_sort_distinct_limit(engine):
    got = engine.query_simple("""
triple ?s <urn:fk:customer:c_nationkey> ?nat
project ?nat
distinct
sort ?nat
limit 5
""")
    rows = [r["nat"]["lex"] for r in got.bindings.collect()]
    assert len(rows) == 5
    assert rows == sorted(rows)


def test_simple_expression_forms(engine):
    # between, cast, arithmetic, unary
    got = engine.query_simple("""
triple ?s <urn:col:customer:c_acctbal> ?bal
filter ?bal 0 100 between
extend dbl ?bal 2 *
project ?s ?dbl
""")
    want = engine.query("""
      SELECT ?s ?dbl WHERE {
        ?s <urn:col:customer:c_acctbal> ?bal .
        FILTER(?bal >= 0 && ?bal <= 100)
        BIND(?bal * 2 AS ?dbl)
      }""")
    assert _rows(got, "s", "dbl") == _rows(want, "s", "dbl")

    e = parse_expression(["?v", "neg", "isnumeric"])
    assert e.op == "ISNUMERIC"


def test_simple_window(engine):
    got = engine.query_simple("""
triple ?s <urn:col:customer:c_acctbal> ?bal
window row ?rn ; ?s
project ?s ?rn
""")
    rows = got.bindings.collect()
    assert len(rows) > 0
    assert all(r["rn"]["lex"] == "1" for r in rows)  # one row per subject


def test_simple_graph_and_quad(spark, fixture_store):
    eng = Engine(fixture_store)
    got = eng.query_simple("""
triple ?s <http://example.org/value> ?v
graph <http://example.org/numbers>
""")
    want = eng.query("""
      SELECT * WHERE {
        GRAPH <http://example.org/numbers> { ?s <http://example.org/value> ?v }
      }""")
    assert _rows(got, "s", "v") == _rows(want, "s", "v")

    q = eng.query_simple(
        "quad ?s <http://example.org/value> ?v <http://example.org/numbers>\n"
    )
    assert _rows(q, "s", "v") == _rows(want, "s", "v")


def test_simple_nps_and_path_ops():
    q = parse_simple_query("nps ?s ?o <urn:p1> <urn:p2>\n")
    from kineo_spark import algebra as A

    assert isinstance(q.algebra, A.PathPattern)
    assert isinstance(q.algebra.path, A.PNps)
    assert len(q.algebra.path.iris) == 2

    q2 = parse_simple_query("path ?s ?o <urn:p> <urn:q> | +\n")
    assert isinstance(q2.algebra.path, A.PPlus)
    assert isinstance(q2.algebra.path.path, A.PAlt)


def test_simple_errors():
    with pytest.raises(SyntaxError):
        parse_simple_query("join\n")  # not enough operands
    with pytest.raises(SyntaxError):
        parse_simple_query("frobnicate ?x\n")
    with pytest.raises(SyntaxError):
        parse_simple_query("")  # empty
    with pytest.raises(SyntaxError):
        parse_expression(["+", "1"])
