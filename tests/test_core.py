"""Core operator tests over the reference's 7-quad micro-fixture and the
driver's relational tables (mirrors the reference's single-operator unit
tests, Tests/KineoTests/QueryEvaluation.swift:224-1541)."""

from pyspark.sql import functions as F

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import EExists, c, fn, v
from kineo_spark.model import iri, lit

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"


def tv(s, p, o):
    return A.TriplePattern(s, p, o)


def test_scan_bound_predicate(fixture_store):
    comp = Compiler(fixture_store)
    plan = comp.compile(A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("o"))))
    rows = plan.df.collect()
    assert len(rows) == 2
    assert {r["o"]["lex"] for r in rows} == {"Berlin", "a number"}


def test_scan_repeated_variable(fixture_store):
    comp = Compiler(fixture_store)
    # ?s ?p ?s — no quad has s == o
    plan = comp.compile(A.Triple(tv(A.Var("s"), A.Var("p"), A.Var("s"))))
    assert plan.df.count() == 0


def test_bgp_join_and_filter(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Filter(
        A.BGP(
            (
                tv(A.Var("s"), iri(FOAF + "name"), A.Var("name")),
                tv(A.Var("s"), iri(EX + "value"), A.Var("val")),
            )
        ),
        v("val") < c(lit(0)),
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 0  # n1 has value 32.7; n2 has no name

    alg2 = A.Filter(
        A.BGP(
            (
                tv(A.Var("s"), iri(FOAF + "name"), A.Var("name")),
                tv(A.Var("s"), iri(EX + "value"), A.Var("val")),
            )
        ),
        v("val") > c(lit(0)),
    )
    rows = comp.compile(alg2).df.collect()
    assert len(rows) == 1 and rows[0]["name"]["lex"] == "a number"


def test_union_distinct_order(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Order(
        A.Distinct(
            A.Union(
                A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("o"))),
                A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("o"))),
            )
        ),
        (A.SortComparator(v("o"), ascending=True),),
    )
    rows = comp.compile(alg).df.collect()
    assert [r["o"]["num"] for r in rows] == [-118.0, 32.7]


def test_optional_leftjoin(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.LeftJoin(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
        A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("name"))),
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 2
    byval = {r["val"]["num"]: r["name"] for r in rows}
    assert byval[32.7] is not None and byval[32.7]["lex"] == "a number"
    assert byval[-118.0] is None  # n2 has no name → unbound


def test_minus_domain_disjoint(fixture_store):
    comp = Compiler(fixture_store)
    # MINUS with disjoint domains removes nothing
    # (MaterializedQueryPlan.swift:554-569)
    alg = A.Minus(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
        A.Triple(tv(A.Var("x"), iri(FOAF + "name"), A.Var("n"))),
    )
    assert comp.compile(alg).df.count() == 2
    # shared ?s: n1 has a name → removed, n2 stays
    alg2 = A.Minus(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
        A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("n"))),
    )
    rows = comp.compile(alg2).df.collect()
    assert len(rows) == 1 and rows[0]["val"]["num"] == -118.0


def test_filter_exists(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Filter(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
        EExists(A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("n")))),
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 1 and rows[0]["val"]["num"] == 32.7


def test_extend_arith_and_project(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Project(
        A.Extend(
            A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
            v("val") * c(lit(2)),
            "twice",
        ),
        ("twice",),
    )
    rows = comp.compile(alg).df.collect()
    assert sorted(r["twice"]["num"] for r in rows) == [-236.0, 65.4]


def test_values_table_join(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Join(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("val"))),
        A.Table(("val",), ((lit(-118),),)),
    )
    rows = comp.compile(alg).df.collect()
    # -118 integer matches by value
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "n2"


def test_named_graph_var(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.NamedGraph(
        A.Var("g"), A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("o")))
    )
    rows = comp.compile(alg).df.collect()
    assert {r["g"]["lex"] for r in rows} == {EX + "numbers"}


def test_slice_offset_limit(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Slice(
        A.Order(
            A.Triple(tv(A.Var("s"), A.Var("p"), A.Var("o"))),
            (A.SortComparator(v("o"), True),),
        ),
        offset=2, limit=3,
    )
    assert comp.compile(alg).df.count() == 3


def test_aggregate_group_avg(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Aggregate(
        A.Triple(tv(A.Var("s"), iri(EX + "value"), A.Var("o"))),
        groups=(), group_names=(),
        aggs=(
            ("n", A.AggSpec("COUNT*")),
            ("avg", A.AggSpec("AVG", v("o"))),
            ("mx", A.AggSpec("MAX", v("o"))),
        ),
    )
    row = comp.compile(alg).df.collect()[0]
    assert row["n"]["num"] == 2
    assert abs(row["avg"]["num"] - (32.7 - 118.0) / 2) < 1e-9
    assert row["mx"]["num"] == 32.7


def test_aggregate_empty_input_emits_row(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Aggregate(
        A.Triple(tv(A.Var("s"), iri(EX + "nope"), A.Var("o"))),
        groups=(), group_names=(),
        aggs=(("n", A.AggSpec("COUNT*")),),
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 1 and rows[0]["n"]["num"] == 0


def test_expression_builtins(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Extend(
        A.Extend(
            A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("name"))),
            fn("UCASE", v("name")), "up",
        ),
        fn("STRLEN", v("name")), "len",
    )
    rows = comp.compile(alg).df.collect()
    m = {r["name"]["lex"]: r for r in rows}
    assert m["Berlin"]["up"]["lex"] == "BERLIN"
    assert m["Berlin"]["len"]["num"] == 6.0


def test_error_as_unbound(fixture_store):
    comp = Compiler(fixture_store)
    # UCASE of an IRI is a type error → extend leaves var unbound
    alg = A.Extend(
        A.Triple(tv(A.Var("s"), iri(FOAF + "homepage"), A.Var("h"))),
        fn("UCASE", v("h")), "up",
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 1 and rows[0]["up"] is None
    # numeric comparison with a string errors → filter drops row
    alg2 = A.Filter(
        A.Triple(tv(A.Var("s"), iri(FOAF + "name"), A.Var("o"))),
        v("o") < c(lit(5)),
    )
    assert comp.compile(alg2).df.count() == 0


def test_langmatches_and_lang(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.Filter(
        A.Triple(tv(A.Var("s"), A.Var("p"), A.Var("o"))),
        fn("LANGMATCHES", fn("LANG", v("o")), c(lit("en"))),
    )
    rows = comp.compile(alg).df.collect()
    assert len(rows) == 1 and rows[0]["o"]["lex"] == "hello"


def test_approx_quantile_extension(spark, rel_store):
    """APPROX_QUANTILE (extension): within sketch tolerance of the exact
    percentile; exact for small inputs at accuracy 10k."""
    import duckdb
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.expr import v
    from kineo_spark.forms import select
    from kineo_spark.model import iri

    tp = A.TriplePattern
    alg = A.Aggregate(
        A.BGP((tp(A.Var("c"), iri("urn:col:customer:c_acctbal"), A.Var("bal")),)),
        groups=(), group_names=(),
        aggs=(("med", A.AggSpec("APPROX_QUANTILE", expr=v("bal"), quantile=0.5)),),
    )
    out = select(Compiler(rel_store), A.SelectQuery(alg, ("med",))).collect()
    got = out[0]["med"]["num"]
    want = duckdb.sql(
        "SELECT quantile_disc(c_acctbal, 0.5) FROM "
        "'/root/testdata/sf0.001/customer.parquet'").fetchone()[0]
    assert abs(got - float(want)) <= abs(float(want)) * 0.01 + 1.0
