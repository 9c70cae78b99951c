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
