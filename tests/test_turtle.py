"""Turtle parser/serializer tests — including the reference's geo
example shape (README.md:24-56: 2-pattern BGP + numeric filters)."""

from kineo_spark.engine import Engine
from kineo_spark.sources.turtle import load_turtle, serialize_turtle
from kineo_spark.store import QuadsDataFrameStore

GEO_TTL = """
@prefix geo: <http://www.w3.org/2003/01/geo/wgs84_pos#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@base <http://example.org/> .

<Berlin> geo:lat "52.5167"^^<http://www.w3.org/2001/XMLSchema#decimal> ;
         geo:long "13.3833"^^<http://www.w3.org/2001/XMLSchema#decimal> ;
         rdfs:label "Berlin"@de, "Berlin"@en .
<Potsdam> geo:lat 52.4 ; geo:long 13.0667 .
<Tokyo> geo:lat 35.69 ; geo:long 139.69 .
_:anon a rdfs:Resource ; rdfs:seeAlso ( <Berlin> <Potsdam> ) .
"""


def test_turtle_parse_and_query(spark):
    quads = load_turtle(spark, GEO_TTL)
    store = QuadsDataFrameStore(spark, quads)
    engine = Engine(store)
    # the reference README query shape: places within a lat/long box
    r = engine.query("""
      PREFIX geo: <http://www.w3.org/2003/01/geo/wgs84_pos#>
      SELECT ?s ?lat ?long WHERE {
        ?s geo:lat ?lat ; geo:long ?long .
        FILTER(?lat >= 52.0) FILTER(?lat <= 53.0) FILTER(?long < 14.0)
      } ORDER BY ?s
    """)
    rows = r.bindings.collect()
    names = [row["s"]["lex"].split("/")[-1] for row in rows]
    assert names == ["Berlin", "Potsdam"]


def test_turtle_lang_and_collections(spark):
    quads = load_turtle(spark, GEO_TTL)
    rows = quads.collect()
    langs = {r.o_lang for r in rows if r.o_lang}
    assert langs == {"de", "en"}
    # collection becomes rdf:first/rdf:rest chain
    firsts = [r for r in rows if r.p_lex.endswith("#first")]
    rests = [r for r in rows if r.p_lex.endswith("#rest")]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(r.o_lex.endswith("nil") for r in rests)


def test_turtle_serializer_roundtrip(spark):
    quads = load_turtle(spark, GEO_TTL)
    text = serialize_turtle(
        quads, {"geo": "http://www.w3.org/2003/01/geo/wgs84_pos#"}
    )
    assert "@prefix geo:" in text
    assert "geo:lat" in text
    back = load_turtle(spark, text)
    assert back.count() == quads.count()
