"""Result serializer + language-preference tests."""

import json

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.forms import select
from kineo_spark.model import iri
from kineo_spark import serializers as ser

FOAF = "http://xmlns.com/foaf/0.1/"
EX = "http://example.org/"


def _df(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.LeftJoin(
        A.Triple(A.TriplePattern(A.Var("s"), iri(EX + "value"), A.Var("v"))),
        A.Triple(A.TriplePattern(A.Var("s"), iri(FOAF + "name"), A.Var("name"))),
    )
    return select(comp, A.SelectQuery(alg, ("s", "v", "name")))


def test_sparql_json(fixture_store):
    out = json.loads(ser.to_sparql_json(_df(fixture_store)))
    assert out["head"]["vars"] == ["s", "v", "name"]
    assert len(out["results"]["bindings"]) == 2
    b = {x["v"]["value"]: x for x in out["results"]["bindings"]}
    assert b["32.7"]["v"]["datatype"].endswith("float")
    assert "name" not in b["-118"]  # unbound omitted
    assert json.loads(ser.ask_to_sparql_json(True))["boolean"] is True


def test_sparql_xml_tsv_csv(fixture_store):
    df = _df(fixture_store)
    xml = ser.to_sparql_xml(df)
    assert '<variable name="v"/>' in xml and "<bnode>" in xml
    tsv = ser.to_sparql_tsv(df)
    assert tsv.splitlines()[0] == "?s\t?v\t?name"
    assert '"32.7"^^<http://www.w3.org/2001/XMLSchema#float>' in tsv
    csv_ = ser.to_sparql_csv(df)
    assert csv_.splitlines()[0] == "s,v,name"


def test_negotiate():
    mt, f = ser.negotiate("text/tab-separated-values, application/json;q=0.9")
    assert mt == "text/tab-separated-values"
    mt, f = ser.negotiate("application/weird")
    assert mt == "application/sparql-results+json"


def test_best_language_filter(spark):
    from kineo_spark.langpref import best_language_quads

    rows = [
        (0, EX + "x", EX + "label", 2, "Hallo", "langString", "de", None, "g"),
        (0, EX + "x", EX + "label", 2, "Hello", "langString", "en", None, "g"),
        (0, EX + "x", EX + "label", 2, "Bonjour", "langString", "fr", None, "g"),
        (0, EX + "x", EX + "size", 2, "5", "integer", None, 5.0, "g"),
    ]
    from kineo_spark.store import QuadsDataFrameStore

    quads = QuadsDataFrameStore.from_rows(spark, rows).quads()
    out = best_language_quads(quads, "en;q=0.9, de;q=0.5").collect()
    lex = sorted(r.o_lex for r in out)
    assert lex == ["5", "Hello"]
