"""SPARQL ordering semantics and isomorphism-comparator tests."""

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import v
from kineo_spark.isomorphism import bindings_isomorphic
from kineo_spark.store import QuadsDataFrameStore


def test_order_by_total_term_order(spark):
    """unbound < blank < IRI < literal; numerics by value
    (OrderPlan, MaterializedQueryPlan.swift:705-748)."""
    rows = [
        (0, "http://z.example/iri", "http://p", 2, "10", "integer", None, 10.0, "g"),
        (1, "bn", "http://p", 2, "2", "integer", None, 2.0, "g"),
        (0, "http://a.example/iri", "http://p", 2, "banana", "string", None, None, "g"),
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    comp = Compiler(store)
    # order subjects: blank first, then IRIs lexicographic
    alg = A.Order(
        A.Triple(A.TriplePattern(A.Var("s"), A.Var("p", binding=False), A.Var("o"))),
        (A.SortComparator(v("s"), True),),
    )
    got = [r["s"]["lex"] for r in comp.compile(alg).df.collect()]
    assert got == ["bn", "http://a.example/iri", "http://z.example/iri"]
    # order objects: numerics by value before plain strings? (valued first)
    alg2 = A.Order(
        A.Triple(A.TriplePattern(A.Var("s", binding=False), A.Var("p", binding=False), A.Var("o"))),
        (A.SortComparator(v("o"), True),),
    )
    got2 = [r["o"]["lex"] for r in comp.compile(alg2).df.collect()]
    assert got2 == ["2", "10", "banana"]
    # optional-produced unbound sorts first
    alg3 = A.Order(
        A.LeftJoin(
            A.Triple(A.TriplePattern(A.Var("s"), A.Var("p", binding=False), A.Var("o", binding=False))),
            A.Triple(A.TriplePattern(A.Var("s"), A.Var("p2", binding=False), A.Var("o2"))),
        ),
        (A.SortComparator(v("o2"), True),),
    )
    df3 = comp.compile(alg3).df
    assert df3.count() >= 3


def test_bindings_isomorphic(spark):
    a = spark.createDataFrame(
        [((1, "b1", None, None, None), (2, "x", "string", None, None)),
         ((1, "b2", None, None, None), (2, "y", "string", None, None))],
        "s struct<kind:tinyint,lex:string,dt:string,lang:string,num:double>, "
        "o struct<kind:tinyint,lex:string,dt:string,lang:string,num:double>",
    )
    b = spark.createDataFrame(
        [((1, "zz", None, None, None), (2, "x", "string", None, None)),
         ((1, "qq", None, None, None), (2, "y", "string", None, None))],
        a.schema,
    )
    assert bindings_isomorphic(a, b)
    c = spark.createDataFrame(
        [((1, "zz", None, None, None), (2, "x", "string", None, None)),
         ((1, "zz", None, None, None), (2, "y", "string", None, None))],  # same bnode!
        a.schema,
    )
    assert not bindings_isomorphic(a, c)


def test_describe_cbd_follows_bnode_closure(spark):
    """CBD: DESCRIBE of a subject whose objects are blank nodes pulls
    in the bnodes' own triples, to closure; plain DESCRIBE does not."""
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.forms import describe
    from kineo_spark.model import iri
    from kineo_spark.store import QuadsDataFrameStore

    EX = "http://example.org/"
    rows = [
        (0, EX + "doc", EX + "author", 1, "a1", None, None, None, "urn:g"),
        (1, "a1", EX + "name", 2, "Ann", "string", None, None, "urn:g"),
        (1, "a1", EX + "addr", 1, "a2", None, None, None, "urn:g"),
        (1, "a2", EX + "city", 2, "Oslo", "string", None, None, "urn:g"),
        (0, EX + "other", EX + "p", 2, "zzz", "string", None, None, "urn:g"),
    ]
    comp = Compiler(QuadsDataFrameStore.from_rows(spark, rows))
    q = A.DescribeQuery(A.JoinIdentity(), nodes=(iri(EX + "doc"),))
    plain = describe(comp, q).collect()
    assert len(plain) == 1  # just doc -> author
    cbd = describe(comp, q, cbd=True).collect()
    triples = sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"]) for r in cbd)
    assert len(cbd) == 4  # + a1's two triples + a2's city
    assert ("a2", EX + "city", "Oslo") in triples
