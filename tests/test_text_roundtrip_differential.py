"""Algebra → SPARQL text → parser round-trip differential (r12).

sparql_text.algebra_to_sparql (the SERVICE federation shipper) and
sparql_parser.parse_query are each example-tested; this family closes
the loop: a random compat tree over the serializable subset (BGP /
VALUES / Join / Union / OPTIONAL / FILTER / MINUS / FILTER (NOT)
EXISTS / BIND / GRAPH <iri> — widened in r12 so SERVICE can federate
them) is evaluated directly AND
re-parsed from its own serialized text, and the two engine results
must be bag-identical. Catches scope-changing serialization (a FILTER
or OPTIONAL losing its group when its parent flattens the text) and
parser mis-grouping — the exact class of bug that silently corrupts
federated SERVICE shipping, where the serialized text IS the remote
query. Reference analog: Kineo serializes subalgebra back to SPARQL
for federation (QueryPlanner.swift:819-833).
"""

import random
from collections import Counter

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import c, fn, v
from kineo_spark.forms import select
from kineo_spark.sparql_parser import parse_query
from kineo_spark.sparql_text import _pattern
from kineo_spark.store import QuadsDataFrameStore
from tests.test_compat_differential import (
    TERMS, VARS, _got_key, _quad_rows, all_vars, rand_bgp, rand_quads,
    rand_table)


def rand_text_expr(rng: random.Random, depth: int = 1):
    """Engine expression from the text-serializable subset (the _expr
    INFIX table + BOUND): =, <, !, &&, ||."""
    r = rng.random()
    if depth > 0 and r < 0.3:
        op = rng.choice(["not", "and", "or"])
        e1 = rand_text_expr(rng, depth - 1)
        if op == "not":
            return ~e1
        e2 = rand_text_expr(rng, depth - 1)
        return (e1 & e2) if op == "and" else (e1 | e2)
    var = rng.choice(VARS)
    r = rng.random()
    if r < 0.3:
        return v(var) == c(rng.choice(TERMS))
    if r < 0.5:
        return v(var) < c(rng.choice(TERMS))
    if r < 0.75:
        return fn("BOUND", v(var))
    return v(var) == v(rng.choice(VARS))


TGRAPHS = ["urn:g:default", "urn:g:g1"]


def rand_text_tree(rng: random.Random, depth: int) -> A.Algebra:
    from kineo_spark.model import iri

    if depth == 0:
        return rand_bgp(rng) if rng.random() < 0.7 else rand_table(rng)
    r = rng.random()
    if r < 0.15:
        return A.Filter(rand_text_tree(rng, depth - 1),
                        rand_text_expr(rng))
    if r < 0.25:
        child = rand_text_tree(rng, depth - 1)
        free = [x for x in ("ex", "ey") if x not in all_vars(child)]
        if free:
            return A.Extend(child, rand_text_expr(rng), rng.choice(free))
    if r < 0.33:
        return A.NamedGraph(iri(rng.choice(TGRAPHS)),
                            rand_text_tree(rng, depth - 1))
    lhs = rand_text_tree(rng, depth - 1)
    rhs = rand_text_tree(rng, depth - 1)
    if r < 0.5:
        return A.Join(lhs, rhs)
    if r < 0.65:
        expr = rand_text_expr(rng) if rng.random() < 0.6 else None
        return A.LeftJoin(lhs, rhs, expr)
    if r < 0.78:
        return A.Minus(lhs, rhs)
    if r < 0.9:
        return A.SemiJoin(lhs, rhs, anti=rng.random() < 0.5)
    return A.Union(lhs, rhs)


def test_filter_scope_braced_in_flat_operands(spark):
    """r12 find (this family's probe): Join(Filter(A, e), B) and
    LeftJoin(Filter(A, e), B) serialized FLAT, so the FILTER escaped
    its group on re-parse — BOUND(?x) with ?x bound only on the other
    side evaluated against the merged row (direct 0 rows, reparsed 1).
    For SERVICE federation the serialized text IS the remote query, so
    the shipped pattern evaluated with the wrong filter scope. The
    serializer now braces any Join/LeftJoin-lhs operand whose flat
    form emits a group-level FILTER (sparql_text._has_group_filter)."""
    from kineo_spark.expr import fn, v
    from kineo_spark.model import iri

    EX = "http://example.org/"
    store = QuadsDataFrameStore.from_rows(spark, [
        (0, EX + "a", EX + "p", 0, EX + "b", None, None, None,
         "urn:g:default"),
        (0, EX + "a", EX + "q", 0, EX + "c", None, None, None,
         "urn:g:default"),
    ])
    filtered = A.Filter(
        A.BGP((A.TriplePattern(A.Var("s"), iri(EX + "p"), A.Var("o")),)),
        fn("BOUND", v("x")))
    other = A.BGP((A.TriplePattern(A.Var("s"), iri(EX + "q"), A.Var("x")),))
    proj = ("o", "s", "x")
    for tree in (
        A.Join(filtered, other),
        A.LeftJoin(filtered, other, None),
        # filter nested under an inner join that itself flattens
        A.Join(A.Join(other, filtered), other),
    ):
        direct = select(Compiler(store), A.SelectQuery(tree, proj)).count()
        text = ("SELECT ?o ?s ?x WHERE {\n" + _pattern(tree) + "\n}")
        reparsed = select(Compiler(store), parse_query(text)).count()
        assert direct == reparsed == 0, (tree, text, direct, reparsed)


@pytest.mark.parametrize("seed", range(14))
def test_text_roundtrip_differential(spark, seed):
    rng = random.Random(6000 + seed)
    quads = rand_quads(rng, graphs=tuple(TGRAPHS))
    tree = rand_text_tree(rng, 2)
    proj = tuple(sorted(all_vars(tree)))
    if not proj:
        return
    store = QuadsDataFrameStore.from_rows(spark, _quad_rows(quads))

    direct = select(Compiler(store), A.SelectQuery(tree, proj))
    got1 = Counter(_got_key(r, proj) for r in direct.collect())

    text = ("SELECT " + " ".join(f"?{x}" for x in proj)
            + " WHERE {\n" + _pattern(tree) + "\n}")
    parsed = parse_query(text)
    reparsed = select(Compiler(store), parsed)
    got2 = Counter(_got_key(r, proj) for r in reparsed.collect())

    assert got1 == got2, (
        f"seed {seed}: tree {tree}\ntext:\n{text}\nquads {quads}\n"
        f"direct-extra={got1 - got2}\nreparsed-extra={got2 - got1}")
