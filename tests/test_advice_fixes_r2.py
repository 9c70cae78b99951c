"""Regression tests for the round-2 ADVICE findings:

1. _scope_vars must follow SPARQL 1.1 §18.2.1 precisely: MINUS rhs and
   FILTER expressions (incl. EXISTS patterns) contribute NO in-scope
   variables, so SELECT-expression / BIND targets may reuse vars that
   appear only there.
2. Signed-numeric AdditiveExpression (grammar [116]) must parse a
   trailing multiplicative tail: '?v-2*3' means ?v + ((-2)*3).
3. FROM default-graph construction is an RDF *merge*: blank nodes from
   different FROM graphs are standardized apart, never identified.
4. w3c harness: qt:graphData .nt files load into the NAMED graph, and
   the BASE-injection check is token-level.
5. explain() is plans-only: Join(local, SERVICE) must not run Spark
   jobs or network I/O at plan time.
"""

import pytest

from kineo_spark.engine import Engine
from kineo_spark.sparql_parser import parse_query
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
G = "urn:g:default"


def _quad(s, p, o, g=G, s_kind=0, o_kind=0):
    return (s_kind, s, EX + p, o_kind, o, None, None, None, g)


# -- 1: §18.2.1 in-scope precision ------------------------------------------

def test_minus_rhs_not_in_scope():
    parse_query("SELECT (1 AS ?x) WHERE { ?s ?p ?o MINUS { ?a ?b ?x } }")


def test_filter_exists_pattern_not_in_scope():
    parse_query(
        "SELECT (1 AS ?z) WHERE { ?s ?p ?o FILTER EXISTS { ?s ?q ?z } }")


def test_filter_not_exists_pattern_not_in_scope():
    parse_query(
        "SELECT ?s WHERE { ?s ?p ?o . BIND(1 AS ?w) "
        "FILTER NOT EXISTS { ?s ?q ?w2 } }")


def test_genuine_reassignment_still_rejected():
    with pytest.raises(SyntaxError):
        parse_query("SELECT (1 AS ?s) WHERE { ?s ?p ?o }")
    with pytest.raises(SyntaxError):
        parse_query("SELECT ?s WHERE { ?s ?p ?o . BIND(1 AS ?o) }")


def test_minus_lhs_still_in_scope():
    with pytest.raises(SyntaxError):
        parse_query("SELECT (1 AS ?s) WHERE { { ?s ?p ?o } MINUS { ?a ?b ?c } }")


# -- 2: signed-numeric multiplicative tail (rule [116]) ----------------------

def test_signed_numeric_mul_tail_parses():
    parse_query("SELECT ?v WHERE { ?s ?p ?v FILTER(?v-2*3 = 0) }")
    parse_query("SELECT ?v WHERE { ?s ?p ?v FILTER(?v+2/4 = 1) }")


def test_signed_numeric_mul_tail_evaluates(spark):
    rows = [
        (0, EX + "a", EX + "p", 2, str(v), "integer", None, float(v), G)
        for v in (5, 6, 7)
    ]
    eng = Engine(QuadsDataFrameStore.from_rows(spark, rows))
    res = eng.query("SELECT ?v WHERE { ?s ?p ?v FILTER(?v-2*3 = 0) }")
    got = [r["v"]["lex"] for r in res.bindings.collect()]
    assert got == ["6"]  # ?v + ((-2)*3) = 0  ⇔  ?v = 6


# -- 3: FROM merge standardizes bnodes apart ---------------------------------

def test_from_merge_bnodes_standardized_apart(spark):
    from kineo_spark.store import DatasetGraphStore

    g1, g2 = EX + "g1", EX + "g2"
    rows = [
        # same bnode label 'b0' in both source graphs → distinct after merge
        _quad("b0", "p", "x", g=g1, s_kind=1),
        _quad("b0", "p", "x", g=g2, s_kind=1),
        # identical ground triple in both graphs → collapses to one
        _quad(EX + "s", "q", EX + "o", g=g1),
        _quad(EX + "s", "q", EX + "o", g=g2),
    ]
    base = QuadsDataFrameStore.from_rows(spark, rows)
    store = DatasetGraphStore(base, (g1, g2), ())
    eng = Engine(store)
    res = eng.query("SELECT ?s ?o WHERE { ?s <" + EX + "p> ?o }")
    assert res.bindings.count() == 2  # bnodes kept apart
    res2 = eng.query("SELECT ?s ?o WHERE { ?s <" + EX + "q> ?o }")
    assert res2.bindings.count() == 1  # ground triples merged


# -- 4: w3c harness graphData .nt → named graph ------------------------------

def test_w3c_nt_graphdata_loads_into_named_graph(spark, tmp_path):
    from kineo_spark.w3c import TestEntry, run_entry

    nt = tmp_path / "g1.nt"
    nt.write_text(f"<{EX}s> <{EX}p> <{EX}o> .\n")
    rq = tmp_path / "q.rq"
    rq.write_text("SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }")
    srj = tmp_path / "q.srj"
    g_iri = "file://" + str(nt)
    srj.write_text(
        '{"head":{"vars":["g"]},"results":{"bindings":['
        '{"g":{"type":"uri","value":"%s"}}]}}' % g_iri)
    entry = TestEntry(
        iri="urn:t", name="nt-graphdata", type="QueryEvaluationTest",
        query_path=str(rq), data_path=None, result_path=str(srj),
        graph_data=(g_iri,))
    out = run_entry(spark, entry)
    assert out.passed, out.detail


# -- 5: explain() is plans-only ---------------------------------------------

def test_explain_service_join_no_network(spark):
    from kineo_spark.explain import explain

    eng = Engine(QuadsDataFrameStore.from_rows(
        spark, [_quad(EX + "a", "p", EX + "b")]))
    # unreachable endpoint + non-SILENT: any fetch attempt would raise
    txt = explain(
        eng,
        "SELECT ?s ?x WHERE { ?s <" + EX + "p> ?o . "
        "SERVICE <http://127.0.0.1:1/sparql> { ?s <" + EX + "q> ?x } }")
    assert "Spark plan" in txt
