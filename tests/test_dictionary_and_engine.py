"""Dictionary-encoded mode, rewrite passes, and the Engine facade."""

from kineo_spark import algebra as A
from kineo_spark.dictionary import bgp_ids, encode_quads, materialize, scan_ids
from kineo_spark.engine import Engine
from kineo_spark.model import iri, lit
from kineo_spark.rewrite import rewrite

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"


def test_encode_scan_materialize(spark, fixture_store):
    quads = fixture_store.quads()
    dictionary, id_quads = encode_quads(quads)
    assert id_quads.count() == 7
    # dictionary has every distinct term exactly once
    assert dictionary.count() == dictionary.select("id").distinct().count()

    pat = A.QuadPattern(A.Var("s"), iri(EX + "value"), A.Var("o"),
                        A.Var("g", binding=False))
    ids = scan_ids(id_quads, pat)
    assert ids.count() == 2
    terms = materialize(ids, dictionary)
    vals = sorted(r["o"]["num"] for r in terms.collect())
    assert vals == [-118.0, 32.7]


def test_bgp_ids_join(spark, fixture_store):
    dictionary, id_quads = encode_quads(fixture_store.quads())
    g = A.Var("g", binding=False)
    pats = [
        A.QuadPattern(A.Var("s"), iri(FOAF + "name"), A.Var("n"), g),
        A.QuadPattern(A.Var("s"), iri(EX + "value"), A.Var("v"), g),
    ]
    ids = bgp_ids(id_quads, pats)
    out = materialize(ids, dictionary).collect()
    assert len(out) == 1
    assert out[0]["n"]["lex"] == "a number"


def test_rewrite_passes():
    from kineo_spark.expr import EConst, c, v

    # path expansion: link → quad, alt → union
    p = A.PathPattern(A.Var("s"), A.PAlt(A.PLink(iri(EX + "p")), A.PLink(iri(EX + "q"))), A.Var("o"))
    out = rewrite(p)
    assert isinstance(out, A.Union)
    assert isinstance(out.lhs, A.Quad) and out.lhs.pattern.p.lex == EX + "p"
    # seq → join on a fresh SHARED mid var, projected away (an internal
    # "__"-prefixed mid would compile to a cross join)
    p2 = rewrite(A.PathPattern(A.Var("s"), A.PSeq(A.PLink(iri(EX + "p")), A.PLink(iri(EX + "q"))), A.Var("o")))
    assert isinstance(p2, A.Project) and set(p2.variables) == {"s", "o"}
    assert isinstance(p2.child, A.Join)
    mid = p2.child.lhs.pattern.o
    assert mid == p2.child.rhs.pattern.s and not mid.name.startswith("__")
    # filter merging
    base = A.Triple(A.TriplePattern(A.Var("s"), A.Var("p"), A.Var("o")))
    f = rewrite(A.Filter(A.Filter(base, v("o") > c(lit(1))), v("o") < c(lit(5))))
    assert isinstance(f, A.Filter) and isinstance(f.child, A.Triple)
    # constant folding
    assert rewrite(A.Filter(base, EConst(lit(True)))) is base
    assert isinstance(rewrite(A.Filter(base, EConst(lit(False)))), A.UnionIdentity)


def test_engine_facade(fixture_store):
    e = Engine(fixture_store)
    r = e.query("""
      PREFIX ex: <http://example.org/>
      SELECT ?s ?v WHERE { ?s ex:value ?v . FILTER(?v < 0) }
    """)
    rows = r.bindings.collect()
    assert len(rows) == 1 and rows[0]["v"]["num"] == -118.0
    assert "-118" in e.serialize(r)

    r2 = e.query("ASK { ?s ?p ?o }")
    assert r2.boolean is True
    assert '"boolean": true' in e.serialize(r2)

    r3 = e.query("""
      PREFIX foaf: <http://xmlns.com/foaf/0.1/>
      PREFIX ex: <http://example.org/>
      CONSTRUCT { ?s ex:n ?n } WHERE { ?s foaf:name ?n }
    """)
    assert r3.triples.count() == 2
