"""Lazy materialization in ID mode: join-only variables stay raw
8-byte dictionary ids through every join/dedup (IDQueryPlan's
evaluation-mode analysis; MaterializeTermsPlan fires only for vars
whose VALUES the query reads), and results match term mode exactly."""

from pyspark.sql import functions as F

from kineo_spark import algebra as A
from kineo_spark.dictionary import id_compiler, needed_value_vars
from kineo_spark.expr import ECall, EVar, v, c
from kineo_spark.forms import select, select_plan
from kineo_spark.model import iri, lit

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"


def _tp(s, p, o):
    mk = lambda x: A.Var(x) if isinstance(x, str) else x  # noqa: E731
    return A.TriplePattern(mk(s), mk(p), mk(o))


def test_needed_value_vars_walker():
    alg = A.Filter(
        A.BGP((_tp("s", iri(FOAF + "name"), "n"),
               _tp("s", iri(EX + "value"), "val"))),
        v("val") > c(lit(1)),
    )
    need = needed_value_vars(alg, ("n",))
    # 'n' projected, 'val' filtered on → needed; 's' is join-only
    assert need is not None and "n" in need and "val" in need
    assert "s" not in need
    # SELECT * → materialize everything
    assert needed_value_vars(alg, None) is None
    # unknown-safe: Service bails
    assert needed_value_vars(A.Service("http://x", alg), ("n",)) is None


def test_lazy_bgp_keeps_ids_and_matches_term_mode(spark, fixture_store):
    comp = id_compiler(fixture_store)
    q = A.SelectQuery(
        A.BGP((_tp("s", iri(FOAF + "name"), "n"),)), ("n",),
    )
    comp.prepare(q)
    plan = comp.compile(q.algebra)
    # the subject is join-only: still a raw long id in the plan
    assert plan.id_vars == {"s"}
    assert dict(plan.df.dtypes)["s"] == "bigint"
    names = sorted(r["n"]["lex"] for r in select(comp, q).collect())
    assert names == ["Berlin", "a number"]


def test_lazy_join_distinct_on_ids(spark, fixture_store):
    """DISTINCT + multi-pattern join over an id var: dedup and join keys
    run on raw longs; values for the projected var are correct."""
    comp = id_compiler(fixture_store)
    q = A.SelectQuery(
        A.Distinct(A.Project(
            A.BGP((_tp("s", iri(EX + "value"), "o"),)), ("o",))),
        ("o",),
    )
    comp.prepare(q)
    vals = sorted(r["o"]["num"] for r in select(comp, q).collect())
    assert vals == [-118.0, 32.7]


def test_ask_materializes_nothing(spark, fixture_store):
    comp = id_compiler(fixture_store)
    q = A.AskQuery(A.BGP((_tp("s", iri(FOAF + "name"), "n"),)))
    comp.prepare(q)
    plan = comp.compile(q.algebra)
    # ASK reads no values: every var stays an id
    assert plan.id_vars == {"s", "n"}
    from kineo_spark.forms import ask
    assert ask(comp, q) is True


import pytest


@pytest.mark.parametrize("key_bits", [64, 128])
def test_range_filter_shadow_prefilter(spark, key_bits):
    """FILTER(?x > n) directly over a 4×long-layout BGP: the o_num
    value shadow pre-filters AT THE SCAN (superset prune — the exact
    conjunct still runs as a residual), so the dictionary join
    materializes survivors only. Results must equal term mode,
    including the error-drop of a non-numeric object. The shadow
    columns are width-independent, so the same pre-filter fires under
    128-bit struct ids."""
    from kineo_spark.compiler import Compiler
    from kineo_spark.expr import fn
    from kineo_spark.store import QuadsDataFrameStore

    G1 = "urn:g:default"
    rows = []
    for i in range(50):
        rows.append((0, f"urn:e{i}", "urn:p:val", 2, str(i), "integer",
                     None, float(i), G1))
        rows.append((0, f"urn:e{i}", "urn:p:name", 2, f"name{i}",
                     "string", None, None, G1))
    # non-numeric object under the filtered predicate: comparison is a
    # type error → row drops in BOTH modes
    rows.append((0, "urn:eX", "urn:p:val", 2, "not-a-number", "string",
                 None, None, G1))
    store = QuadsDataFrameStore.from_rows(spark, rows)
    alg = A.Filter(
        A.BGP((
            A.TriplePattern(A.Var("s"), iri("urn:p:val"), A.Var("x")),
            A.TriplePattern(A.Var("s"), iri("urn:p:name"), A.Var("n")),
        )),
        fn(">", v("x"), c(lit(30))),
    )
    q = A.SelectQuery(alg, ("n",))
    term = sorted(r["n"]["lex"] for r in select(Compiler(store), q).collect())
    comp = id_compiler(store, key_bits=key_bits)
    comp.prepare(q)
    id_df = select(comp, q)
    got = sorted(r["n"]["lex"] for r in id_df.collect())
    assert got == term and len(got) == 19
    # the shadow predicate reached the id-quads scan (pre-materialize)
    plan = id_df._jdf.queryExecution().executedPlan().toString()
    assert "o_num" in plan, plan


def test_string_range_filter_shadow_prefilter(spark):
    """String range conjuncts pre-filter via the o_str prefix shadow:
    strict bounds relax to non-strict prefix comparisons (superset),
    residual restores exactness — incl. for strings longer than the
    shadow, lang-tagged literals (compared by lex, matching the
    engine's string ordering), and numeric objects (error → drop)."""
    from kineo_spark.compiler import Compiler
    from kineo_spark.dictionary import STR_SHADOW_LEN
    from kineo_spark.expr import fn
    from kineo_spark.store import QuadsDataFrameStore

    G1 = "urn:g:default"
    long_in = "m" + "x" * (STR_SHADOW_LEN + 5)   # > "k", beyond shadow
    rows = [
        (0, "urn:a", "urn:p:v", 2, "alpha", "string", None, None, G1),
        (0, "urn:b", "urn:p:v", 2, "mike", "string", None, None, G1),
        (0, "urn:c", "urn:p:v", 2, "zulu", "string", None, None, G1),
        (0, "urn:d", "urn:p:v", 2, long_in, "string", None, None, G1),
        (0, "urn:e", "urn:p:v", 2, "papa", "langString", "en", None, G1),
        (0, "urn:f", "urn:p:v", 2, "7", "integer", None, 7.0, G1),
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    alg = A.Filter(
        A.BGP((A.TriplePattern(A.Var("s"), iri("urn:p:v"), A.Var("x")),)),
        fn(">", v("x"), c(lit("k"))),
    )
    q = A.SelectQuery(alg, ("s",))
    term = sorted(r["s"]["lex"] for r in select(Compiler(store), q).collect())
    comp = id_compiler(store)
    comp.prepare(q)
    id_df = select(comp, q)
    got = sorted(r["s"]["lex"] for r in id_df.collect())
    assert got == term == ["urn:b", "urn:c", "urn:d", "urn:e"]
    plan = id_df._jdf.queryExecution().executedPlan().toString()
    assert "o_str" in plan, plan


def test_temporal_range_filter_shadow_prefilter(spark):
    """dateTime range conjuncts take the num shadow too (the engine's
    temporal ordering IS the num/epoch comparison): pre-filter at the
    scan, exact residual, results equal term mode."""
    from kineo_spark.compiler import Compiler
    from kineo_spark.expr import fn
    from kineo_spark.model import lexical_num
    from kineo_spark.store import QuadsDataFrameStore

    G1 = "urn:g:default"
    rows = []
    for i, day in enumerate(("01", "03", "05", "07", "09")):
        lex = f"2024-06-{day}T12:00:00Z"
        rows.append((0, f"urn:e{i}", "urn:p:when", 2, lex, "dateTime",
                     None, lexical_num(lex, "dateTime"), G1))
    # a plain string under the predicate: temporal comparison errors →
    # row drops in both modes
    rows.append((0, "urn:eX", "urn:p:when", 2, "yesterday", "string",
                 None, None, G1))
    store = QuadsDataFrameStore.from_rows(spark, rows)
    cut = lit("2024-06-04T00:00:00Z", dt="dateTime")
    alg = A.Filter(
        A.BGP((A.TriplePattern(A.Var("s"), iri("urn:p:when"), A.Var("t")),)),
        fn(">", v("t"), c(cut)),
    )
    q = A.SelectQuery(alg, ("s",))
    term = sorted(r["s"]["lex"] for r in select(Compiler(store), q).collect())
    comp = id_compiler(store)
    comp.prepare(q)
    id_df = select(comp, q)
    got = sorted(r["s"]["lex"] for r in id_df.collect())
    assert got == term == ["urn:e2", "urn:e3", "urn:e4"]
    plan = id_df._jdf.queryExecution().executedPlan().toString()
    assert "o_num" in plan, plan
