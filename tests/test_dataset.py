"""FROM / FROM NAMED dataset scoping (SPARQL 1.1 §13.2) + round-2
parser long-tail: empty prefix ':', signed-number additive expressions,
paths inside blank-node property lists."""

from kineo_spark.engine import Engine


EX = "http://example.org/"


def _rows(engine, q):
    r = engine.query(q)
    return r.bindings.collect()


def test_from_scopes_default_graph(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"SELECT ?o FROM <{EX}numbers> WHERE {{ ?s <{EX}value> ?o }}")
    assert sorted(r.o.lex for r in rows) == ["-118", "32.7"]
    # the numbers graph is the WHOLE default graph: nothing else matches
    rows = _rows(e, f"SELECT ?s FROM <{EX}numbers> WHERE "
                    f"{{ ?s <http://xmlns.com/foaf/0.1/homepage> ?o }}")
    assert rows == []


def test_from_only_means_no_named_graphs(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"SELECT ?g FROM <{EX}numbers> WHERE {{ GRAPH ?g {{ ?s ?p ?o }} }}")
    assert rows == []


def test_from_named_only_means_empty_default(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"SELECT ?s FROM NAMED <{EX}other> WHERE {{ GRAPH ?g {{ ?s ?p ?o }} }}")
    assert [r.s.lex for r in rows] == ["x"]
    rows = _rows(e, f"SELECT ?s FROM NAMED <{EX}other> WHERE {{ ?s ?p ?o }}")
    assert rows == []


def test_from_merge_dedupes_shared_triples(spark):
    from kineo_spark.store import QuadsDataFrameStore

    rows = [
        (0, "http://ex/a", "http://ex/p", 0, "http://ex/b", None, None, None, "http://ex/g1"),
        (0, "http://ex/a", "http://ex/p", 0, "http://ex/b", None, None, None, "http://ex/g2"),
        (0, "http://ex/a", "http://ex/q", 0, "http://ex/c", None, None, None, "http://ex/g2"),
    ]
    e = Engine(QuadsDataFrameStore.from_rows(spark, rows))
    # default graph = merge of g1,g2: the shared triple appears ONCE
    got = _rows(e, "SELECT ?s ?o FROM <http://ex/g1> FROM <http://ex/g2> "
                   "WHERE { ?s <http://ex/p> ?o }")
    assert len(got) == 1


def test_empty_prefix_colon(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"PREFIX : <{EX}> SELECT ?o WHERE "
                    "{ GRAPH :numbers { ?s :value ?o } }")
    assert len(rows) == 2


def test_signed_number_additive_expr(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"SELECT (?v+1 AS ?w) WHERE "
                    f"{{ GRAPH <{EX}numbers> {{ ?s <{EX}value> ?v }} "
                    f"FILTER(?v > 0) }}")
    assert len(rows) == 1 and abs(rows[0].w.num - 33.7) < 1e-9
    rows = _rows(e, f"SELECT (?v-18 AS ?w) WHERE "
                    f"{{ GRAPH <{EX}numbers> {{ ?s <{EX}value> ?v }} "
                    f"FILTER(?v < 0) }}")
    assert len(rows) == 1 and rows[0].w.num == -136.0


def test_select_distinct_expression(fixture_store):
    e = Engine(fixture_store)
    rows = _rows(e, f"SELECT DISTINCT (?v*0 AS ?z) WHERE "
                    f"{{ GRAPH <{EX}numbers> {{ ?s <{EX}value> ?v }} }}")
    # DISTINCT is term-level: 0^^integer and 0.0^^float both survive
    assert sorted(r.z.lex for r in rows) == ["0", "0.0"]


def test_path_in_bnode_property_list(spark):
    # [ p/q ?n ] — a property path as the verb of a blank-node
    # property list (grammar: PropertyListPathNotEmpty via VerbPath)
    from kineo_spark.store import QuadsDataFrameStore

    rows = [
        (0, "http://ex/a", "http://ex/p", 0, "http://ex/b", None, None, None, "urn:g:default"),
        (0, "http://ex/b", "http://ex/q", 0, "http://ex/c", None, None, None, "urn:g:default"),
    ]
    e = Engine(QuadsDataFrameStore.from_rows(spark, rows))
    got = _rows(e, "SELECT ?n WHERE { [ <http://ex/p>/<http://ex/q> ?n ] }")
    assert [r.n.lex for r in got] == ["http://ex/c"]
