"""SPARQL text front-end tests: parse → compile → execute over the
micro-fixture and the relational store, checking results (not just
parse success) — the reference's W3C-style strategy in miniature."""

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.forms import ask, construct, select
from kineo_spark.sparql_parser import parse_query

PFX = """
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX ex: <http://example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""


def run(store, text):
    q = parse_query(PFX + text)
    comp = Compiler(store)
    if isinstance(q, A.AskQuery):
        return ask(comp, q)
    if isinstance(q, A.ConstructQuery):
        return construct(comp, q).collect()
    return select(comp, q).collect()


def test_parse_select_bgp_filter_order(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s ?v WHERE {
        ?s ex:value ?v .
        FILTER(?v > 0)
      } ORDER BY DESC(?v)
    """)
    assert len(rows) == 1 and rows[0]["v"]["num"] == 32.7


def test_parse_optional_and_bind(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s ?v ?name ?double WHERE {
        ?s ex:value ?v .
        BIND(?v * 2 AS ?double)
        OPTIONAL { ?s foaf:name ?name }
      }
    """)
    assert len(rows) == 2
    m = {r["v"]["num"]: r for r in rows}
    assert m[32.7]["name"]["lex"] == "a number"
    assert m[-118.0]["name"] is None
    assert m[-118.0]["double"]["num"] == -236.0


def test_parse_union_distinct(fixture_store):
    rows = run(fixture_store, """
      SELECT DISTINCT ?s WHERE {
        { ?s foaf:name ?o } UNION { ?s ex:value ?o }
      }
    """)
    assert len(rows) == 3  # Berlin, n1, n2 (n1 in both branches)


def test_parse_aggregate_group(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s (COUNT(*) AS ?n) (AVG(?v) AS ?avg) WHERE {
        ?s ex:value ?v .
      } GROUP BY ?s
    """)
    assert len(rows) == 2
    assert {r["n"]["num"] for r in rows} == {1.0}


def test_parse_having_and_global_agg(fixture_store):
    rows = run(fixture_store, """
      SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
    """)
    assert rows[0]["n"]["num"] == 7.0


def test_parse_values_and_in(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s WHERE {
        ?s ex:value ?v .
        FILTER(?v IN (-118, 99))
      }
    """)
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "n2"


def test_parse_property_path_seq_and_plus(fixture_store):
    rows = run(fixture_store, """
      SELECT ?home WHERE {
        ex:Berlin foaf:homepage ?home .
      }
    """)
    assert rows[0]["home"]["lex"] == "http://www.berlin.de/en/"


def test_parse_exists_minus(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s WHERE {
        ?s ex:value ?v .
        FILTER NOT EXISTS { ?s foaf:name ?n }
      }
    """)
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "n2"


def test_parse_ask_and_construct(fixture_store):
    assert run(fixture_store, "ASK { ?s foaf:name ?n }") is True
    assert run(fixture_store, "ASK { ?s foaf:name ex:nope }") is False
    triples = run(fixture_store, """
      CONSTRUCT { ?s ex:hasName ?n } WHERE { ?s foaf:name ?n }
    """)
    assert len(triples) == 2
    assert {t["o"]["lex"] for t in triples} == {"Berlin", "a number"}


def test_parse_subquery_and_slice(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s WHERE {
        { SELECT ?s WHERE { ?s ?p ?o } }
      } LIMIT 3
    """)
    assert len(rows) == 3


def test_parse_graph_var(fixture_store):
    rows = run(fixture_store, """
      SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ex:value ?o } }
    """)
    assert len(rows) == 1 and rows[0]["g"]["lex"] == "http://example.org/numbers"


def test_parse_langmatches_builtin(fixture_store):
    rows = run(fixture_store, """
      SELECT ?o WHERE { ?s ?p ?o . FILTER(LANGMATCHES(LANG(?o), "en")) }
    """)
    assert len(rows) == 1 and rows[0]["o"]["lex"] == "hello"


def test_parse_typed_literal_and_cast(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s WHERE {
        ?s ex:value "-118"^^xsd:integer .
      }
    """)
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "n2"


def test_parse_relational_roundtrip(rel_store):
    rows = run(rel_store, """
      SELECT ?name ?bal WHERE {
        ?c <urn:col:customer:c_name> ?name ;
           <urn:col:customer:c_acctbal> ?bal .
        FILTER(?bal > 9500)
      } ORDER BY DESC(?bal) LIMIT 5
    """)
    assert 0 < len(rows) <= 5
    assert all(r["bal"]["num"] > 9500 for r in rows)


def test_parse_lang_tagged_literal(fixture_store):
    rows = run(fixture_store, """
      SELECT ?s WHERE { ?s ex:p "hello"@en }
    """)
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "x"
    assert run(fixture_store, 'ASK { ?s ex:p "hello"@fr }') is False
