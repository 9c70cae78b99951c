"""Property-path tests over the FIXTURES.md §6 shape: a :knows chain
a→b→c→d→e, a cycle x→y→z→x, and a disconnected node — exercising
closure convergence on cycles (reference alp seen-set,
MaterializedQueryPlan.swift:1707-1722)."""

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.model import iri
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
KNOWS = EX + "knows"
LIKES = EX + "likes"
G = "urn:g:default"


@pytest.fixture(scope="module")
def path_store(spark):
    def q(s, p, o):
        return (0, EX + s, p, 0, EX + o, None, None, None, G)

    rows = [
        q("a", KNOWS, "b"), q("b", KNOWS, "c"), q("c", KNOWS, "d"), q("d", KNOWS, "e"),
        q("x", KNOWS, "y"), q("y", KNOWS, "z"), q("z", KNOWS, "x"),
        q("a", LIKES, "z"),
        q("lonely", LIKES, "lonely"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def _pairs(comp, path, s="s", o="o"):
    alg = A.PathPattern(A.Var(s), path, A.Var(o))
    df = comp.compile(alg).df
    return {(r[s]["lex"].split("/")[-1], r[o]["lex"].split("/")[-1]) for r in df.collect()}


def test_plus_chain_and_cycle(path_store):
    comp = Compiler(path_store)
    got = _pairs(comp, A.PPlus(A.PLink(iri(KNOWS))))
    # chain closure
    assert ("a", "e") in got and ("a", "b") in got and ("b", "e") in got
    # cycle: every node reaches every node incl. itself
    for u in "xyz":
        for w in "xyz":
            assert (u, w) in got
    # no cross-component leakage
    assert ("a", "x") not in got
    assert len(got) == 10 + 9  # chain C(5,2)=10 pairs + cycle 3*3


def test_star_includes_zero_length(path_store):
    comp = Compiler(path_store)
    got = _pairs(comp, A.PStar(A.PLink(iri(KNOWS))))
    assert ("e", "e") in got          # zero-length on a node with no out-edge
    assert ("lonely", "lonely") in got  # node only present via other predicate
    assert ("a", "e") in got


def test_zero_or_one(path_store):
    comp = Compiler(path_store)
    got = _pairs(comp, A.PZeroOrOne(A.PLink(iri(KNOWS))))
    assert ("a", "b") in got and ("a", "a") in got
    assert ("a", "c") not in got


def test_inverse_and_seq(path_store):
    comp = Compiler(path_store)
    got = _pairs(comp, A.PInv(A.PLink(iri(KNOWS))))
    assert ("b", "a") in got and ("a", "b") not in got
    got = _pairs(comp, A.PSeq(A.PLink(iri(KNOWS)), A.PLink(iri(KNOWS))))
    assert ("a", "c") in got and ("a", "b") not in got


def test_alt_and_nps(path_store):
    comp = Compiler(path_store)
    got = _pairs(comp, A.PAlt(A.PLink(iri(KNOWS)), A.PLink(iri(LIKES))))
    assert ("a", "z") in got and ("a", "b") in got
    got = _pairs(comp, A.PNps((iri(KNOWS),)))
    assert got == {("a", "z"), ("lonely", "lonely")}


def test_bound_endpoint_plus(path_store):
    comp = Compiler(path_store)
    alg = A.PathPattern(iri(EX + "a"), A.PPlus(A.PLink(iri(KNOWS))), A.Var("o"))
    df = comp.compile(alg).df
    got = {r["o"]["lex"].split("/")[-1] for r in df.collect()}
    assert got == {"b", "c", "d", "e"}


# --- doubling closure (recursive squaring, O(log d) rounds) -----------------

def test_doubling_matches_seminaive(path_store):
    # same result set on chain + cycle + mixed components
    sem = _pairs(Compiler(path_store), A.PPlus(A.PLink(iri(KNOWS))))
    dbl = _pairs(Compiler(path_store, path_strategy="doubling"),
                 A.PPlus(A.PLink(iri(KNOWS))))
    assert dbl == sem
    sem_star = _pairs(Compiler(path_store), A.PStar(A.PLink(iri(KNOWS))))
    dbl_star = _pairs(Compiler(path_store, path_strategy="doubling"),
                      A.PStar(A.PLink(iri(KNOWS))))
    assert dbl_star == sem_star


def test_doubling_converges_on_long_chain(spark):
    # a 200-edge chain exceeds the default 64-round budget for one-hop
    # growth; doubling covers length ≤ 2^k after k rounds, so it
    # converges in ~8 — the high-diameter case the strategy exists for
    n = 200
    rows = [
        (0, f"{EX}n{i}", KNOWS, 0, f"{EX}n{i+1}", None, None, None, G)
        for i in range(n)
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    comp = Compiler(store, path_strategy="doubling")
    alg = A.PathPattern(A.Var("s"), A.PPlus(A.PLink(iri(KNOWS))), A.Var("o"))
    assert comp.compile(alg).df.count() == n * (n + 1) // 2

    # semi-naive needs d rounds and must refuse (not silently truncate)
    with pytest.raises(RuntimeError, match="did not converge"):
        Compiler(store, max_path_iterations=32).compile(alg).df.count()


def test_nested_closure_in_sequence(path_store):
    """likes/knows* — a closure NESTED inside a sequence (previously
    rejected with 'nested closure paths must go through eval_path')."""
    comp = Compiler(path_store)
    p = A.PSeq(A.PLink(iri(LIKES)), A.PStar(A.PLink(iri(KNOWS))))
    got = {(a, b) for a, b in _pairs(comp, p)}
    assert got == {("a", "z"), ("a", "x"), ("a", "y"),
                   ("lonely", "lonely")}


def test_nested_plus_under_star(path_store):
    """(knows+|likes)* — a plus-closure nested under alternation under
    star; reachability is the closure of knows∪likes plus identity."""
    comp = Compiler(path_store)
    p = A.PStar(A.PAlt(A.PPlus(A.PLink(iri(KNOWS))), A.PLink(iri(LIKES))))
    got = {b for a, b in _pairs(comp, p) if a == "a"}
    assert got == {"a", "b", "c", "d", "e", "z", "x", "y"}


def test_nested_star_of_sequence(path_store):
    """(knows/knows)* — even-length knows walks."""
    comp = Compiler(path_store)
    p = A.PStar(A.PSeq(A.PLink(iri(KNOWS)), A.PLink(iri(KNOWS))))
    got = {b for a, b in _pairs(comp, p) if a == "a"}
    assert got == {"a", "c", "e"}


def test_nested_closure_id_mode(path_store):
    """The ID-mode evaluator composes nested closures identically."""
    from kineo_spark.dictionary import id_compiler

    term_comp = Compiler(path_store)
    idc = id_compiler(path_store)
    for p in (
        A.PSeq(A.PLink(iri(LIKES)), A.PStar(A.PLink(iri(KNOWS)))),
        A.PStar(A.PAlt(A.PPlus(A.PLink(iri(KNOWS))), A.PLink(iri(LIKES)))),
        A.PSeq(A.PZeroOrOne(A.PLink(iri(LIKES))), A.PPlus(A.PLink(iri(KNOWS)))),
    ):
        assert _pairs(idc, p) == _pairs(term_comp, p)
