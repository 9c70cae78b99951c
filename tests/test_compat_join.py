"""Scale-safe compatibility join: an OPTIONAL-produced (maybe-unbound)
variable rejoined downstream must (a) produce SPARQL-compatible results
— unbound matches anything, merged value comes from the bound side —
and (b) compile the bound⋈bound bulk to a hash-joinable EQUI-join, not
a BroadcastNestedLoopJoin over the full inputs."""

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.model import iri
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
G = "urn:g:default"


def _q(s, p, o):
    return (0, EX + s, EX + p, 0, EX + o, None, None, None, G)


@pytest.fixture(scope="module")
def opt_store(spark):
    rows = [
        _q("a", "p", "o1"), _q("b", "p", "o2"),
        _q("a", "q", "X"),            # b has no q → ?v unbound for b
        _q("t1", "r", "X"), _q("t2", "r", "Y"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def _alg():
    tp = A.TriplePattern
    left = A.LeftJoin(
        A.BGP((tp(A.Var("s"), iri(EX + "p"), A.Var("o")),)),
        A.BGP((tp(A.Var("s"), iri(EX + "q"), A.Var("v")),)),
        None,
    )
    right = A.BGP((tp(A.Var("t"), iri(EX + "r"), A.Var("v")),))
    return A.Join(left, right)


def _n(term):
    return term["lex"].rsplit("/", 1)[-1]


def test_compat_join_results(opt_store):
    df = Compiler(opt_store).compile(_alg()).df
    got = {(_n(r["s"]), _n(r["t"]), _n(r["v"])) for r in df.collect()}
    # a has v=X → joins t1 only; b has v unbound → compatible with both,
    # v merged from the right side
    assert got == {("a", "t1", "X"), ("b", "t1", "X"), ("b", "t2", "Y")}


def test_compat_join_plan_has_equi_bulk(opt_store):
    df = Compiler(opt_store).compile(_alg()).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bound⋈bound branch must be an equi join (hash or sort-merge)
    assert any(s in plan for s in
               ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")), plan
    # nested-loop appears only for the null-slice branches (≤2 for one
    # maybe-unbound var), never as the sole join strategy
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_strict_join_unchanged(opt_store):
    # both sides certain → single equi join, no union branches
    tp = A.TriplePattern
    alg = A.Join(
        A.BGP((tp(A.Var("s"), iri(EX + "p"), A.Var("o")),)),
        A.BGP((tp(A.Var("s"), iri(EX + "q"), A.Var("v")),)),
    )
    df = Compiler(opt_store).compile(alg).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert {(_n(r["s"]), _n(r["v"])) for r in df.collect()} == {("a", "X")}


# --- bind join (VALUES → scan pre-filter) ----------------------------------

def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bind_join_pushes_in_filter(spark, rel_store):
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.model import iri, lit
    from kineo_spark.forms import select

    tp = A.TriplePattern
    comp = Compiler(rel_store)
    alg = A.Join(
        A.Table(("name",), ((lit("Customer#000000001"),),
                            (lit("Customer#000000002"),))),
        A.BGP((tp(A.Var("c"), iri("urn:col:customer:c_name"), A.Var("name")),)),
    )
    df = select(comp, A.SelectQuery(alg, ("c", "name")))
    assert df.count() == 2
    plan = _executed(df)
    assert "In(c_name" in plan or "c_name#" in plan and " IN (" in plan


def test_bind_join_skips_undef_vars(spark, rel_store):
    # a var with UNDEF in any VALUES row must NOT pre-filter the scan
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.model import iri, lit
    from kineo_spark.forms import select

    tp = A.TriplePattern
    comp = Compiler(rel_store)
    alg = A.Join(
        A.Table(("name",), ((lit("Customer#000000001"),), (None,))),
        A.BGP((tp(A.Var("c"), iri("urn:col:customer:c_name"), A.Var("name")),)),
    )
    df = select(comp, A.SelectQuery(alg, ("c", "name")))
    # UNDEF row is compatible with EVERY customer: 1 exact + all rows
    n_cust = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet").count()
    assert df.count() == n_cust + 1


# --- bind-seed inversion (row IRIs → native pk IN (...) pushdown) -----------

def _bind_alg(values_var, values_terms, patterns):
    from kineo_spark import algebra as A
    return A.Join(
        A.Table((values_var,), tuple((t,) for t in values_terms)),
        A.BGP(tuple(patterns)),
    )


def test_bind_join_subject_pk_pushdown(spark, rel_store):
    # VALUES over subject row IRIs inverts to In(c_custkey, ...) in the
    # parquet PushedFilters — point lookup, not a full scan + isin
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.model import iri
    from kineo_spark.forms import select

    tp = A.TriplePattern
    comp = Compiler(rel_store)
    alg = _bind_alg("c", [iri("urn:t:customer:1"), iri("urn:t:customer:7")], [
        tp(A.Var("c"), iri("urn:col:customer:c_name"), A.Var("name")),
        tp(A.Var("c"), iri("urn:col:customer:c_acctbal"), A.Var("bal")),
    ])
    df = select(comp, A.SelectQuery(alg, ("c", "name", "bal")))
    assert {r["c"]["lex"] for r in df.collect()} == {
        "urn:t:customer:1", "urn:t:customer:7"}
    plan = _executed(df)
    assert "In(c_custkey, [1,7]" in plan, plan


def test_bind_join_fk_object_pushdown(spark, rel_store):
    # VALUES over FK-target row IRIs inverts onto the fk column
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.model import iri
    from kineo_spark.forms import select

    tp = A.TriplePattern
    comp = Compiler(rel_store)
    alg = _bind_alg("n", [iri("urn:t:nation:3")], [
        tp(A.Var("c"), iri("urn:fk:customer:c_nationkey"), A.Var("n")),
    ])
    df = select(comp, A.SelectQuery(alg, ("c", "n")))
    plan = _executed(df)
    assert "c_nationkey" in plan and ("In(c_nationkey" in plan
                                      or "EqualTo(c_nationkey,3" in plan
                                      or "(c_nationkey,3)" in plan), plan
    # every result really is a nation-3 customer
    assert df.count() > 0
    assert all(r["n"]["lex"] == "urn:t:nation:3" for r in df.collect())


def test_bind_join_foreign_iri_is_empty(spark, rel_store):
    # a VALUES IRI that is not a row IRI of any seeded table matches
    # nothing: the inverted condition is literally false
    from kineo_spark import algebra as A
    from kineo_spark.compiler import Compiler
    from kineo_spark.model import iri
    from kineo_spark.forms import select

    tp = A.TriplePattern
    comp = Compiler(rel_store)
    alg = _bind_alg("c", [iri("http://example.org/not-a-row")], [
        tp(A.Var("c"), iri("urn:col:customer:c_name"), A.Var("name")),
        tp(A.Var("c"), iri("urn:col:customer:c_acctbal"), A.Var("bal")),
    ])
    df = select(comp, A.SelectQuery(alg, ("c", "name", "bal")))
    assert df.count() == 0


def test_bind_seed_dropped_on_mixed_branches(spark, rel_store):
    # unbound predicate → the object var binds to literals in col
    # branches and row IRIs in fk branches; the seed must NOT survive
    # (an OR-of-IN filter would wrongly drop the literal rows)
    from kineo_spark import algebra as A
    from kineo_spark.model import iri

    pat = A.QuadPattern(iri("urn:t:nation:3"), A.Var("p"), A.Var("o"),
                        A.Var("g"))
    df = rel_store.scan(pat)
    assert not [c for c in df.columns if c.startswith("__bind_")]
    # and the scan still returns the full mixed row set
    kinds = {r["o"]["kind"] for r in df.collect()}
    assert len(kinds) >= 2  # literals and IRIs both present
