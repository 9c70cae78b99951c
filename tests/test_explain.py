"""Engine.explain / algebra serialization (reference: `kineo explain`,
kineo-cli/main.swift:275-333; QueryPlan.serialize, QueryPlan.swift:147-247)."""

from kineo_spark.engine import Engine
from kineo_spark.explain import serialize_query
from kineo_spark.sparql_parser import parse_query


def test_serialize_query_tree_shape():
    q = parse_query(
        "SELECT ?s WHERE { ?s a ?t . FILTER(?t = <http://example.org/T>) } LIMIT 5"
    )
    out = serialize_query(q)
    lines = out.splitlines()
    assert lines[0].startswith("SelectQuery")
    # nested nodes indent by two spaces each level
    assert any(l.startswith("  Slice") for l in lines)
    assert any("Filter" in l for l in lines)
    assert any("BGP" in l for l in lines)
    # terms and vars render in SPARQL surface syntax
    assert "?s" in out and "<http://example.org/T>" in out


def test_engine_explain_select(fixture_store):
    e = Engine(fixture_store)
    out = e.explain(
        "SELECT ?name WHERE { <http://example.org/Berlin> "
        "<http://xmlns.com/foaf/0.1/name> ?name }",
        mode="simple",
    )
    assert "Parsed query:" in out
    assert "Rewritten algebra:" in out
    assert "Spark plan [simple]:" in out
    assert "== Physical Plan ==" in out


def test_engine_explain_ask_and_construct(fixture_store):
    e = Engine(fixture_store)
    for q in (
        "ASK { ?s ?p ?o }",
        "CONSTRUCT { ?s <http://ex/out> ?o } WHERE { ?s ?p ?o }",
    ):
        out = e.explain(q, mode="simple")
        assert "== Physical Plan ==" in out


def test_explain_analyze_metrics(fixture_store):
    """--analyze executes the query and annotates the FINAL (post-AQE)
    physical plan with per-operator row counts and time metrics — the
    reference's QueryPlan wall-time tree analog
    (SPARQL/QueryPlan.swift:11-111)."""
    from kineo_spark.explain import explain_analyze

    e = Engine(fixture_store)
    out = explain_analyze(
        e,
        "SELECT ?s ?name WHERE { ?s <http://xmlns.com/foaf/0.1/name> ?name }",
    )
    assert "== Analyzed plan ==" in out
    # wall time + result rows in the header
    assert "rows," in out and "s wall)" in out
    # at least one operator reports a live row-count metric
    assert "rows=" in out
    # scan shows up with its metrics
    assert any("Scan" in l and "rows=" in l for l in out.splitlines())
