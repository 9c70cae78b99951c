"""Stats-driven BGP join ordering (Compiler._order_units +
CharacteristicSets estimates)."""

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler, Plan
from kineo_spark.forms import select
from kineo_spark.model import iri, lit
from kineo_spark.stats import CharacteristicSets
from kineo_spark.store import QuadsDataFrameStore


@pytest.fixture(scope="module")
def skew_store(spark):
    """1 rare-predicate quad vs 200 common-predicate quads."""
    rows = []
    G = "urn:g"
    for i in range(200):
        rows.append((f"urn:s{i}", "urn:p:common", f"urn:o{i % 50}", G))
    rows.append(("urn:s0", "urn:p:rare", "urn:hub", G))
    for i in range(20):
        rows.append((f"urn:hub", "urn:p:link", f"urn:x{i}", G))
    return QuadsDataFrameStore.from_rows(
        spark,
        [(0, s, p, 0, o, None, None, None, g) for s, p, o, g in rows],
    )


def test_estimates_reflect_predicate_frequency(skew_store):
    st = CharacteristicSets.for_store(skew_store)
    var = A.Var
    common = A.QuadPattern(var("s"), iri("urn:p:common"), var("o"), var("g"))
    rare = A.QuadPattern(var("s"), iri("urn:p:rare"), var("o"), var("g"))
    assert st.estimate_pattern(common) > 100
    assert st.estimate_pattern(rare) <= 2
    # bound object shrinks the estimate
    bound_o = A.QuadPattern(var("s"), iri("urn:p:common"), iri("urn:o1"), var("g"))
    assert st.estimate_pattern(bound_o) < st.estimate_pattern(common)


def test_stats_order_preserves_results(spark, skew_store):
    tp = A.TriplePattern
    alg = A.BGP((
        tp(A.Var("s"), iri("urn:p:common"), A.Var("o")),
        tp(A.Var("s"), iri("urn:p:rare"), A.Var("hub")),
        tp(A.Var("hub"), iri("urn:p:link"), A.Var("x")),
    ))
    q = A.SelectQuery(alg, ("s", "o", "hub", "x"))

    def run(**kw):
        df = select(Compiler(skew_store, **kw), q)
        return sorted(
            (r["s"]["lex"], r["o"]["lex"], r["hub"]["lex"], r["x"]["lex"])
            for r in df.collect()
        )

    plain = run()
    ordered = run(cs_stats=True)
    assert plain == ordered
    # s0 matches urn:p:common once, urn:p:rare once; hub links 20 ways
    assert len(ordered) == 20


def test_order_units_greedy_connected(spark):
    def plan(cols):
        df = spark.createDataFrame([tuple("x" for _ in cols)], ", ".join(
            f"{c} string" for c in cols))
        return Plan(df, frozenset(cols))

    comp = Compiler.__new__(Compiler)  # only _order_units needed
    a = plan(["v1", "v2"])   # est 1000
    b = plan(["v2", "v3"])   # est 10
    c = plan(["v3", "v4"])   # est 500
    out = comp._order_units([(a, 1000.0), (b, 10.0), (c, 500.0)])
    # smallest first; then connected-smallest (c shares v3), then a
    assert [p.variables for p in out] == [
        ["v2", "v3"], ["v3", "v4"], ["v1", "v2"]]
    # missing estimates -> syntactic order untouched
    out2 = comp._order_units([(a, 1000.0), (b, None), (c, 500.0)])
    assert [id(p.df) for p in out2] == [id(a.df), id(b.df), id(c.df)]


def test_id_mode_stats_order_preserves_results(spark, skew_store):
    from kineo_spark.dictionary import id_compiler

    tp = A.TriplePattern
    alg = A.BGP((
        tp(A.Var("s"), iri("urn:p:common"), A.Var("o")),
        tp(A.Var("s"), iri("urn:p:rare"), A.Var("hub")),
        tp(A.Var("hub"), iri("urn:p:link"), A.Var("x")),
    ))
    q = A.SelectQuery(alg, ("s", "o", "hub", "x"))

    def run(**kw):
        df = select(id_compiler(skew_store, **kw), q)
        return sorted(
            (r["s"]["lex"], r["o"]["lex"], r["hub"]["lex"], r["x"]["lex"])
            for r in df.collect()
        )

    assert run() == run(cs_stats=True)
    assert len(run(cs_stats=True)) == 20
