"""RDF/XML source tests (reference RDF/RDFXML.swift:14-522): feature
coverage, engine queryability, and serializer roundtrip."""

from kineo_spark.engine import Engine
from kineo_spark.sources.rdfxml import load_rdfxml, parse_rdfxml, serialize_rdfxml
from kineo_spark.store import QuadsDataFrameStore

DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/" xml:base="http://example.org/">
  <rdf:Description rdf:about="alice">
    <ex:name>Alice</ex:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:knows rdf:resource="bob"/>
    <ex:label xml:lang="de">Alice</ex:label>
  </rdf:Description>
  <ex:Person rdf:about="bob" ex:nick="bobby">
    <ex:addr rdf:parseType="Resource"><ex:city>Berlin</ex:city></ex:addr>
    <ex:items rdf:parseType="Collection">
      <rdf:Description rdf:about="i1"/>
      <rdf:Description rdf:about="i2"/>
    </ex:items>
    <ex:friend><ex:Person rdf:about="carol"><ex:name>Carol</ex:name></ex:Person></ex:friend>
  </ex:Person>
  <rdf:Seq rdf:about="seq1"><rdf:li>one</rdf:li><rdf:li>two</rdf:li></rdf:Seq>
</rdf:RDF>"""


def test_rdfxml_features():
    quads = parse_rdfxml(DOC)
    spo = {(q[1], q[2], q[4]) for q in quads}
    EX, RDF = "http://example.org/", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    # xml:base resolution + plain/typed/lang literals
    assert (EX + "alice", EX + "name", "Alice") in spo
    age = [q for q in quads if q[2] == EX + "age"][0]
    assert age[5] == "integer" and age[7] == 30.0
    lbl = [q for q in quads if q[2] == EX + "label"][0]
    assert lbl[5] == "langString" and lbl[6] == "de"
    # typed node element + property attribute
    assert (EX + "bob", RDF + "type", EX + "Person") in spo
    assert (EX + "bob", EX + "nick", "bobby") in spo
    # parseType=Resource hangs properties off a bnode
    addr = [q for q in quads if q[2] == EX + "addr"][0]
    assert addr[3] == 1  # bnode object
    assert any(q[1] == addr[4] and q[4] == "Berlin" for q in quads)
    # collection is a well-formed rdf list ending in nil
    firsts = [q for q in quads if q[2] == RDF + "first"]
    assert {q[4] for q in firsts} == {EX + "i1", EX + "i2"}
    assert any(q[2] == RDF + "rest" and q[4] == RDF + "nil" for q in quads)
    # rdf:li numbering
    assert (EX + "seq1", RDF + "_1", "one") in spo
    assert (EX + "seq1", RDF + "_2", "two") in spo
    # nested node element links parent → child
    assert (EX + "bob", EX + "friend", EX + "carol") in spo


def test_rdfxml_engine_query(spark):
    store = QuadsDataFrameStore(spark, load_rdfxml(spark, DOC))
    rows = Engine(store).query("""
      PREFIX ex: <http://example.org/>
      SELECT ?n WHERE { ?p ex:knows/ex:name ?n }
    """).bindings.collect()
    # alice knows bob; bob has no ex:name (only nick) — path yields none;
    # carol's name reachable via bob's friend
    rows2 = Engine(store).query("""
      PREFIX ex: <http://example.org/>
      SELECT ?n WHERE { ?p ex:friend/ex:name ?n }
    """).bindings.collect()
    assert [r["n"]["lex"] for r in rows2] == ["Carol"] and rows == []


def test_rdfxml_roundtrip(spark):
    q1 = load_rdfxml(spark, DOC)
    xml2 = serialize_rdfxml(q1)
    q2 = load_rdfxml(spark, xml2)
    # roundtrip preserves the triple multiset modulo bnode labels:
    # compare (s_is_bnode, p, o_lex-or-bnode-marker) bags
    def canon(df):
        out = []
        for r in df.collect():
            out.append((
                "b" if r.s_kind == 1 else r.s_lex, r.p_lex,
                "b" if r.o_kind == 1 else r.o_lex, r.o_dt, r.o_lang,
            ))
        return sorted(out)
    assert canon(q1) == canon(q2)
