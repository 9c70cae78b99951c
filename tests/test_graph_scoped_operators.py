"""Per-graph evaluation of non-monotonic operators under ``GRAPH ?var``
(SPARQL 1.1 §18.1.7; reference: the per-graph union wraps ALL operators,
QueryPlanner.swift:834-878).

Round-10 fix: Aggregate, Window, and Slice previously evaluated GLOBALLY
under GRAPH ?var — a subquery COUNT inside GRAPH ?g returned one
cross-graph total (bound to an arbitrary graph), grouped counts paired
groups with the WRONG graphs, and LIMIT took k rows across graphs. The
engine now threads the active-graph column as an implicit group /
partition / slice key — the distributed form of the reference's
per-graph loop (one shuffle keyed by (graph, keys), no driver
iteration).
"""

from collections import Counter

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import v
from kineo_spark.forms import select
from kineo_spark.model import iri
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
G1, G2 = "urn:g:g1", "urn:g:g2"


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        (0, EX + "a", EX + "p", 2, "3", "integer", None, 3.0, G1),
        (0, EX + "b", EX + "p", 2, "1", "integer", None, 1.0, G1),
        (0, EX + "c", EX + "p", 2, "2", "integer", None, 2.0, G2),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def _rows(df, cols):
    return Counter(
        tuple(r[c]["lex"] if r[c] is not None else None for c in cols)
        for r in df.collect())


def _sub(child, proj):
    return A.Subquery(A.SelectQuery(child, proj))


SCAN = A.BGP((A.TriplePattern(A.Var("s"), iri(EX + "p"), A.Var("val")),))


def _run(store, alg, proj, kb=None):
    q = A.SelectQuery(alg, proj)
    if kb is None:
        comp = Compiler(store)
    else:
        from kineo_spark.dictionary import id_compiler
        comp = id_compiler(store, key_bits=kb)
        comp.prepare(q)
    return _rows(select(comp, q), proj)


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_scalar_count_under_graph_var(store, kb):
    agg = A.Aggregate(SCAN, (), (), (("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("c",)))
    got = _run(store, alg, ("g", "c"), kb)
    assert got == Counter({(G1, "2"): 1, (G2, "1"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_scalar_count_empty_graph_fill(store, kb):
    """A graph where the pattern matches NOTHING still emits its
    empty-bag row: COUNT()=0 per §18.5 over the empty multiset — the
    per-graph evaluation of the subquery runs once per named graph."""
    scan_a = A.BGP((A.TriplePattern(iri(EX + "a"), iri(EX + "p"),
                                    A.Var("val")),))
    agg = A.Aggregate(scan_a, (), (), (("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("c",)))
    got = _run(store, alg, ("g", "c"), kb)
    assert got == Counter({(G1, "1"): 1, (G2, "0"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_scalar_count_empty_graph_fill_unprojected_g(store, kb):
    """Same fill, but ?g is NEVER read — in id mode the graph var then
    rides as a dictionary id (needed_value_vars doesn't mark it), which
    the r10 fill skipped entirely: the COUNT=0 row for the empty graph
    was silently lost (ADVICE r10, medium). The fill now anti-joins
    names(D) in id space too (aggregates.py)."""
    scan_a = A.BGP((A.TriplePattern(iri(EX + "a"), iri(EX + "p"),
                                    A.Var("val")),))
    agg = A.Aggregate(scan_a, (), (), (("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("c",)))
    got = _run(store, alg, ("c",), kb)
    assert got == Counter({("1",): 1, ("0",): 1})


@pytest.mark.parametrize("kb", [64, 128])
def test_scalar_sum_empty_graph_fill_unprojected_g(store, kb):
    """SUM's empty-bag row is 0 (§18.5.1.3) — per empty graph, id mode."""
    scan_a = A.BGP((A.TriplePattern(iri(EX + "a"), iri(EX + "p"),
                                    A.Var("val")),))
    agg = A.Aggregate(scan_a, (), (),
                      (("t", A.AggSpec("SUM", expr=v("val"))),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("t",)))
    got = _run(store, alg, ("t",), kb)
    assert got == Counter({("3",): 1, ("0",): 1})


def test_grouped_count_under_graph_var(store):
    agg = A.Aggregate(SCAN, (v("s"),), ("s",),
                      (("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("s", "c")))
    got = _run(store, alg, ("g", "s", "c"))
    assert got == Counter({
        (G1, EX + "a", "1"): 1, (G1, EX + "b", "1"): 1,
        (G2, EX + "c", "1"): 1})


def test_sum_groups_per_graph_not_across(store):
    agg = A.Aggregate(SCAN, (), (),
                      (("t", A.AggSpec("SUM", expr=v("val"))),))
    alg = A.NamedGraph(A.Var("g"), _sub(agg, ("t",)))
    got = _run(store, alg, ("g", "t"))
    assert got == Counter({(G1, "4"): 1, (G2, "2"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_rank_window_partitions_per_graph(store, kb):
    w = A.Window(SCAN, functions=(
        ("r", A.WindowSpec("RANK",
                           order=(A.SortComparator(v("val"), True),))),))
    alg = A.NamedGraph(A.Var("g"), w)
    got = _run(store, alg, ("g", "s", "r"), kb)
    assert got == Counter({
        (G1, EX + "a", "2"): 1, (G1, EX + "b", "1"): 1,
        (G2, EX + "c", "1"): 1})


def test_running_sum_frame_stays_in_graph(store):
    w = A.Window(SCAN, functions=(
        ("rs", A.WindowSpec("SUM", expr=v("val"),
                            order=(A.SortComparator(v("val"), True),),
                            frame_start=None, frame_end=0)),))
    alg = A.NamedGraph(A.Var("g"), w)
    got = _run(store, alg, ("g", "s", "rs"))
    # g1: b(1)->1, a(3)->4; g2: c(2)->2 — a cross-graph frame would
    # fold g2's 2 into g1's running sums
    assert got == Counter({
        (G1, EX + "b", "1.0"): 1, (G1, EX + "a", "4.0"): 1,
        (G2, EX + "c", "2.0"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_ordered_limit_under_graph_var(store, kb):
    inner = A.Slice(
        A.Project(A.Order(SCAN, (A.SortComparator(v("val"), True),)),
                  ("s",)),
        offset=0, limit=1)
    alg = A.NamedGraph(A.Var("g"), _sub(inner, ("s",)))
    got = _run(store, alg, ("g", "s"), kb)
    # smallest val per graph: b (1) in g1, c (2) in g2 — a global
    # LIMIT 1 would return a single row
    assert got == Counter({(G1, EX + "b"): 1, (G2, EX + "c"): 1})


def test_offset_under_graph_var(store):
    inner = A.Slice(
        A.Project(A.Order(SCAN, (A.SortComparator(v("val"), True),)),
                  ("s",)),
        offset=1, limit=None)
    alg = A.NamedGraph(A.Var("g"), _sub(inner, ("s",)))
    got = _run(store, alg, ("g", "s"))
    # skip the first per graph: g1 keeps a (val 3), g2 keeps nothing
    assert got == Counter({(G1, EX + "a"): 1})


def test_subquery_projection_keeps_per_graph_bags(store):
    """A subquery projecting AWAY everything graph-specific must still
    union per-graph bags: SELECT ?val inside GRAPH ?g keeps one row per
    (graph, solution), not a cross-graph bag."""
    alg = A.NamedGraph(A.Var("g"), _sub(SCAN, ("val",)))
    got = _run(store, alg, ("g", "val"))
    assert got == Counter({
        (G1, "3"): 1, (G1, "1"): 1, (G2, "2"): 1})


def test_global_aggregate_unchanged(store):
    """Outside GRAPH ?var nothing changes: one global row."""
    agg = A.Aggregate(SCAN, (), (), (("c", A.AggSpec("COUNT*")),))
    got = _run(store, _sub(agg, ("c",)), ("c",))
    assert got == Counter({("3",): 1})


def test_graph_constant_aggregate_scopes_to_that_graph(store):
    """GRAPH <g1> { subquery COUNT } — a CONSTANT graph needs no
    per-graph key, just the scope."""
    agg = A.Aggregate(SCAN, (), (), (("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(iri(G1), _sub(agg, ("c",)))
    got = _run(store, alg, ("c",))
    assert got == Counter({("2",): 1})


# --- ordered DISTINCT + LIMIT (r10 find: dedup destroyed sort order) --------

@pytest.fixture(scope="module")
def many_store(spark):
    rows = []
    vals = [5, 3, 9, 1, 3, 7, 1, 8, 9, 2]
    for i, val in enumerate(vals):
        grp = G1 if i % 2 == 0 else G2
        rows.append((0, EX + f"s{i}", EX + "p", 2, str(val), "integer",
                     None, float(val), grp))
    return QuadsDataFrameStore.from_rows(spark, rows)


def _distinct_limit_alg(k, desc=False):
    return A.Slice(
        A.Distinct(A.Project(
            A.Order(SCAN, (A.SortComparator(v("val"), not desc),)),
            ("val",))),
        offset=0, limit=k)


def test_ordered_distinct_limit_global(spark, many_store):
    """SELECT DISTINCT ?val ... ORDER BY ?val LIMIT 2 — dropDuplicates
    does not preserve sort order, so the engine must dedup FIRST and
    re-sort (previously the limit took term-KEY-string minima)."""
    got = [int(r["val"]["lex"]) for r in
           select(Compiler(many_store),
                  A.SelectQuery(_distinct_limit_alg(2), ("val",))).collect()]
    # all values across both graphs: distinct sorted = 1,2,3,5,7,8,9
    assert got == [1, 2]
    got_desc = [int(r["val"]["lex"]) for r in
                select(Compiler(many_store),
                       A.SelectQuery(_distinct_limit_alg(2, desc=True),
                                     ("val",))).collect()]
    assert got_desc == [9, 8]


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_ordered_distinct_limit_under_graph_var(spark, many_store, kb):
    """The same shape inside GRAPH ?g: per-graph DISTINCT, per-graph
    re-sort, per-graph LIMIT. g1 vals {5,9,3,1,9}->distinct min 1;
    g2 vals {3,1,7,8,2}->distinct min 1; second-smallest differ."""
    inner = _distinct_limit_alg(2)
    alg = A.NamedGraph(A.Var("g"), _sub(inner, ("val",)))
    got = _run(many_store, alg, ("g", "val"), kb)
    assert got == Counter({
        (G1, "1"): 1, (G1, "3"): 1, (G2, "1"): 1, (G2, "2"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_project_of_distinct_order_limit_under_graph_var(spark, many_store,
                                                         kb):
    """Non-canonical layering Slice(Project(Distinct(Order(X)))) — the
    DISTINCT dedups FULL-WIDTH rows below the projection. The r10
    decomposition probed Distinct→Project→Order in that fixed order, so
    this tree's inner Order went undetected and the per-graph
    row_number ordered by lit(1) (ADVICE r10). Here full-width dedup
    collapses the duplicate (s,val) row in each graph (s2/s8 share
    val 9 in g1 but differ in s — NOT dedup'd), then the slice takes
    the 2 smallest vals per graph."""
    inner = A.Slice(
        A.Project(
            A.Distinct(A.Order(SCAN,
                               (A.SortComparator(v("val"), True),))),
            ("val",)),
        offset=0, limit=2)
    alg = A.NamedGraph(A.Var("g"), _sub(inner, ("val",)))
    got = _run(many_store, alg, ("g", "val"), kb)
    # g1 rows (s,val): (s0,5)(s2,9)(s4,3)(s6,1)(s8,9) — all distinct
    # full-width; ordered vals 1,3,5,9,9 → limit 2 → {1,3}
    # g2 rows: (s1,3)(s3,1)(s5,7)(s7,8)(s9,2) → ordered 1,2,3,7,8 → {1,2}
    assert got == Counter({
        (G1, "1"): 1, (G1, "3"): 1, (G2, "1"): 1, (G2, "2"): 1})


# --- MINUS under GRAPH ?var (r11 fuzz find) ----------------------------------

@pytest.mark.parametrize("kb", [None, 64, 128])
def test_minus_disjoint_domains_under_graph_var(store, kb):
    """GRAPH ?g { <scan> MINUS { VALUES ?z { 1 } } }: §18.1.7 evaluates
    the MINUS per graph with plain §18.5 semantics — ?g is evaluation
    scope, NOT a mapping variable, so the sides are dom-disjoint and
    nothing cancels. The r11 order/slice fuzzer (graph family, seed 10)
    caught the threaded graph column counting as a shared var: the
    graph-transparent VALUES row, bound once per named graph, cancelled
    every row of its graph."""
    from kineo_spark.model import lit as _lit
    rhs = A.Table(("z",), ((_lit(1),),))
    alg = A.NamedGraph(A.Var("g"), A.Minus(SCAN, rhs))
    got = _run(store, alg, ("g", "s", "val"), kb)
    assert got == Counter({
        (G1, EX + "a", "3"): 1, (G1, EX + "b", "1"): 1,
        (G2, EX + "c", "2"): 1})


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_minus_graph_var_bound_in_both_operands_cancels(spark, kb):
    """GRAPH ?g { ?s <p> ?g MINUS { ?x <q> ?g } }: when the pattern
    itself binds ?g on BOTH sides, ?g is a genuine mapping variable
    inside the per-graph evaluation (§18.1.7 joins eval(D[g], P) with
    {?g→g} — an occurrence of ?g in P is just a variable), so domains
    OVERLAP on ?g and cancellation applies per graph. ADVICE r12: the
    r11 fix excluded ?g from dom-disjointness purely by name, leaving
    this query uncancelled. The carve-out is now syntactic
    (algebra.may_bind_vars over both operand subtrees)."""
    rows = [
        # G1: a self-referential p-edge AND a q-edge to the graph term
        (0, EX + "a", EX + "p", 0, G1, None, None, None, G1),
        (0, EX + "x", EX + "q", 0, G1, None, None, None, G1),
        # G1 also has a p-edge to ANOTHER graph's term: ?g pattern
        # occurrences must restrict to the active graph, so this row
        # never reaches the MINUS
        (0, EX + "c", EX + "p", 0, G2, None, None, None, G1),
        # G2: a p-edge to its own term, NO q-edge → survives
        (0, EX + "b", EX + "p", 0, G2, None, None, None, G2),
    ]
    st = QuadsDataFrameStore.from_rows(spark, rows)
    lhs = A.BGP((A.TriplePattern(A.Var("s"), iri(EX + "p"), A.Var("g")),))
    rhs = A.BGP((A.TriplePattern(A.Var("x"), iri(EX + "q"), A.Var("g")),))
    alg = A.NamedGraph(A.Var("g"), A.Minus(lhs, rhs))
    got = _run(st, alg, ("g", "s"), kb)
    assert got == Counter({(G2, EX + "b"): 1})

    # one-sided occurrence: ?g bound only in the LEFT operand — the
    # sides stay dom-disjoint (right binds only ?x/?y) and nothing
    # cancels, exactly the r11 behavior
    rhs1 = A.BGP((A.TriplePattern(A.Var("x"), iri(EX + "q"), A.Var("y")),))
    alg1 = A.NamedGraph(A.Var("g"), A.Minus(lhs, rhs1))
    got1 = _run(st, alg1, ("g", "s"), kb)
    assert got1 == Counter({(G1, EX + "a"): 1, (G2, EX + "b"): 1})


def test_may_bind_vars_walker():
    """algebra.may_bind_vars: dom-contributing positions only —
    FILTER mentions don't bind, Project restricts, Extend/Aggregate/
    Window outputs and all-None VALUES columns are handled."""
    from kineo_spark.algebra import may_bind_vars
    from kineo_spark.expr import ECall, v
    from kineo_spark.model import lit as _lit

    tp = A.TriplePattern(A.Var("s"), iri(EX + "p"), A.Var("o"))
    bgp = A.BGP((tp,))
    assert may_bind_vars(bgp) == {"s", "o"}
    # FILTER expression mentions are not bindings
    assert may_bind_vars(A.Filter(bgp, ECall("=", (v("o"), v("zzz"))))) \
        == {"s", "o"}
    assert may_bind_vars(A.Project(bgp, ("s",))) == {"s"}
    assert may_bind_vars(A.Extend(bgp, v("o"), "o2")) == {"s", "o", "o2"}
    # VALUES column that is UNDEF in every row never enters dom
    t = A.Table(("a", "b"), ((_lit(1), None), (_lit(2), None)))
    assert may_bind_vars(t) == {"a"}
    # MINUS/SemiJoin rhs never contributes
    other = A.BGP((A.TriplePattern(A.Var("x"), iri(EX + "q"), A.Var("y")),))
    assert may_bind_vars(A.Minus(bgp, other)) == {"s", "o"}
    assert may_bind_vars(A.SemiJoin(bgp, other)) == {"s", "o"}
    agg = A.Aggregate(bgp, (v("s"),), ("s",),
                      (("n", A.AggSpec("COUNT")),))
    assert may_bind_vars(agg) == {"s", "n"}
    sub = A.Subquery(A.SelectQuery(bgp, ("o",)))
    assert may_bind_vars(sub) == {"o"}


@pytest.mark.parametrize("kb", [None, 64, 128])
def test_minus_shared_var_still_cancels_per_graph(store, kb):
    """MINUS with a genuinely shared var under GRAPH ?g cancels within
    the graph only: the graph column stays in the COMPATIBILITY
    condition (a g2 right row must not cancel a g1 left row)."""
    rhs = A.BGP((A.TriplePattern(A.Var("s"), iri(EX + "p"),
                                 A.Var("other")),))
    # rhs matches every (s, val) pair per graph → every lhs row shares
    # ?s with a compatible rhs row OF ITS OWN GRAPH → all cancelled
    alg = A.NamedGraph(A.Var("g"), A.Minus(SCAN, rhs))
    got = _run(store, alg, ("g", "s", "val"), kb)
    assert got == Counter()


# --- id-mode representation through subquery projections (r10) --------------

@pytest.mark.parametrize("kb", [64, 128])
def test_idmode_join_of_two_subqueries_on_id_var(spark, kb):
    """Two subqueries joined on a var neither projects the VALUE of:
    in id mode the var rides as a dictionary id through BOTH subquery
    projections — select_plan must preserve the Plan.id_vars marking,
    or the join above would term_key() raw longs (r10: select_plan
    previously stripped id_vars)."""
    from kineo_spark.dictionary import id_compiler

    rows = [
        (0, EX + "c1", EX + "bal", 2, "10", "integer", None, 10.0, G1),
        (0, EX + "c1", EX + "age", 2, "30", "integer", None, 30.0, G1),
        (0, EX + "c1", EX + "name", 2, "alice", "string", None, None, G1),
        (0, EX + "c2", EX + "age", 2, "40", "integer", None, 40.0, G1),
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    sub1 = A.Subquery(A.SelectQuery(
        A.BGP((A.TriplePattern(A.Var("c"), iri(EX + "bal"),
                               A.Var("b")),)), ("c",)))
    sub2 = A.Subquery(A.SelectQuery(
        A.BGP((A.TriplePattern(A.Var("c"), iri(EX + "age"),
                               A.Var("a")),)), ("c",)))
    alg = A.Join(A.Join(sub1, sub2),
                 A.BGP((A.TriplePattern(A.Var("c"), iri(EX + "name"),
                                        A.Var("n")),)))
    q = A.SelectQuery(alg, ("n",))
    comp = id_compiler(store, key_bits=kb)
    comp.prepare(q)
    got = [r["n"]["lex"] for r in select(comp, q).collect()]
    assert got == ["alice"]
