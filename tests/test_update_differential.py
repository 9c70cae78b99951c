"""Differential fuzz for SPARQL 1.1 Update sequences (judge r11 #4).

Engine: update.GraphStore applying random op sequences (INSERT DATA /
DELETE DATA / DELETE-INSERT WHERE / CLEAR / COPY-MOVE-ADD), with the
Modify WHERE evaluated by the term compiler and by the id64/id128
dictionary compilers (update.apply_op key_bits). Reference: an
independent dict-of-quads interpreter written from the Update spec
§3.1 (InsertData §3.1.1 set-union of ground quads, DeleteData §3.1.2
set-difference, DeleteInsert §3.1.3: bindings from the PRE-state,
deletes instantiated and applied before inserts, unbound/ill-formed
template instantiations silently skipped) and §3.2.3-5 graph management.
WHERE evaluation reuses the spec-derived compat evaluator
(tests.test_compat_differential.ref_eval).

States are compared EXACTLY after every op — the generator emits no
template blank nodes, so no isomorphism is needed (fresh-bnode
templates are covered by the vendored W3C Update manifests, which do
compare isomorphically). Reference engine analog: the reference
declares sparqlUpdate11 but evaluates none of it
(QueryPlanner.swift:1075-1076), so the spec text is the only oracle.
"""

import random

import pytest

from kineo_spark import algebra as A
from kineo_spark.model import KIND_IRI, KIND_LITERAL, PyTerm, iri
from tests.test_compat_differential import (
    G, LITS, NODES, PREDS, VARS, rand_bgp, ref_eval, tt)

GRAPHS = [G, "urn:g:g1", "urn:g:g2"]

# quad state representation: frozenset of (s_lex, p_lex, o_triple, g_lex)
# — s is always an IRI in the generator pools, o_triple = tt(term)


def _rand_ground_quads(rng, n_lo=1, n_hi=4):
    """Random ground quad specs in the engine's (TriplePattern, graph)
    form + the interpreter's tuple form. Objects include quoted-triple
    terms (r12: RDF-star flows through INSERT/DELETE DATA and the
    state compare — subjects stay IRIs so the state tuple's bare
    s_lex is unambiguous)."""
    from tests.test_compat_differential import QUOTED

    specs, tuples = [], []
    for _ in range(rng.randint(n_lo, n_hi)):
        s = iri(rng.choice(NODES))
        p = iri(rng.choice(PREDS))
        r = rng.random()
        if r < 0.55:
            o = iri(rng.choice(NODES))
        elif r < 0.85:
            o = rng.choice(LITS)
        else:
            o = rng.choice(QUOTED)
        g = None if rng.random() < 0.6 else iri(rng.choice(GRAPHS[1:]))
        specs.append((A.TriplePattern(s, p, o), g))
        tuples.append((s.lex, p.lex, tt(o), g.lex if g else G))
    return tuple(specs), tuples


def _rand_templates(rng, wvars, n_lo=0, n_hi=2):
    """Random DELETE/INSERT templates: nodes are WHERE vars (sometimes
    a var the WHERE does NOT bind — instantiation must skip those rows
    on both sides) or ground terms; graph target None/named."""
    out = []
    for _ in range(rng.randint(n_lo, n_hi)):
        def node(pool_lits=True):
            r = rng.random()
            if wvars and r < 0.55:
                return A.Var(rng.choice(wvars))
            if r < 0.62:
                return A.Var("unbound_tv")  # never bound: row skipped
            if pool_lits and rng.random() < 0.35:
                return rng.choice(LITS)
            return iri(rng.choice(NODES))
        s, p, o = node(pool_lits=False), node(pool_lits=False), node()
        g = None if rng.random() < 0.7 else iri(rng.choice(GRAPHS[1:]))
        out.append((A.TriplePattern(s, p, o), g))
    return tuple(out)


def _ref_instantiate(bindings, templates, default_g):
    """§3.1.3 template instantiation over the WHERE solutions: skip a
    template for a row when any var is unbound; skip ill-formed quads
    (literal subject, non-IRI predicate or graph). Mirrors the engine's
    _instantiate filter exactly (update.py)."""
    out = set()
    for k in bindings:
        d = dict(k)
        for tp, g in templates:
            def val(node):
                if isinstance(node, A.Var):
                    return d.get(node.name)
                return tt(node)
            s, p, o = val(tp.s), val(tp.p), val(tp.o)
            if s is None or p is None or o is None:
                continue
            if s[0] == KIND_LITERAL or p[0] != KIND_IRI:
                continue
            if g is None:
                g_lex = default_g
            elif isinstance(g, PyTerm):
                g_lex = g.lex
            else:
                gt = d.get(g.name)
                if gt is None or gt[0] != KIND_IRI:
                    continue
                g_lex = gt[1]
            out.add((s[1], p[1], o, g_lex))
    return out


def _ref_apply(state: set, op, tuples=None) -> set:
    """The §3.1/§3.2 interpreter: one op over a set of ground quads."""
    if isinstance(op, A.InsertData):
        return state | set(tuples)
    if isinstance(op, A.DeleteData):
        return state - set(tuples)
    if isinstance(op, A.Modify):
        quads = sorted(state)
        # WHERE over the PRE-state: USING merges its graphs into the
        # WHERE's default graph (§3.1.5.3), WITH scopes WHERE to one
        # graph AND re-targets default templates (§3.1.3), else the
        # engine's UNION default graph. The generator never emits
        # WITH+USING together (spec: USING makes WITH ignored for the
        # WHERE; engines vary on the combination).
        if op.dataset:
            scope = frozenset(op.dataset[0])
        elif op.with_graph is not None:
            scope = op.with_graph.lex
        else:
            scope = None
        tmpl_g = op.with_graph.lex if op.with_graph is not None else G
        bindings = ref_eval(op.where, quads, scope)
        dels = _ref_instantiate(bindings, op.delete, tmpl_g)
        ins = _ref_instantiate(bindings, op.insert, tmpl_g)
        return (state - dels) | ins
    if isinstance(op, A.Clear):
        t = op.target
        if t == "ALL":
            return set()
        if t == "DEFAULT":
            return {q for q in state if q[3] != G}
        if t == "NAMED":
            return {q for q in state if q[3] == G}
        return {q for q in state if q[3] != t.lex}
    if isinstance(op, A.GraphMgmt):
        lex = (lambda x: G if x == "DEFAULT" else x.lex)
        src, dst = lex(op.src), lex(op.dst)
        if src == dst:
            return state
        moved = {(s, p, o, dst) for s, p, o, g in state if g == src}
        if op.op == "ADD":
            return state | moved
        keep = {q for q in state if q[3] != dst}
        if op.op == "MOVE":
            keep = {q for q in keep if q[3] != src}
        return keep | moved
    raise NotImplementedError(type(op).__name__)


def _rand_op(rng):
    """One random update op + (for ground-data ops) its tuple form."""
    r = rng.random()
    if r < 0.30:
        specs, tuples = _rand_ground_quads(rng)
        return A.InsertData(specs), tuples
    if r < 0.50:
        specs, tuples = _rand_ground_quads(rng, 1, 3)
        return A.DeleteData(specs), tuples
    if r < 0.88:
        bgp = rand_bgp(rng)
        wvars = sorted({n.name for tp in bgp.patterns
                        for n in (tp.s, tp.p, tp.o) if isinstance(n, A.Var)})
        where: A.Algebra = bgp
        graphed = rng.random() < 0.25
        if graphed:
            # GRAPH <iri> block joined with a default-scope pattern —
            # WHERE scopes compose inside one Modify (§3.1.3)
            gbgp = rand_bgp(rng)
            wvars = sorted(set(wvars) | {
                n.name for tp in gbgp.patterns
                for n in (tp.s, tp.p, tp.o) if isinstance(n, A.Var)})
            where = A.Join(bgp, A.NamedGraph(iri(rng.choice(GRAPHS[1:])),
                                             gbgp))
        if rng.random() < 0.3:
            # FILTER-ed WHERE: error-drops-row composes with templates
            from tests.test_compat_differential import rand_expr
            e_eng, e_ref = rand_expr(rng, ebv_ok=True)
            where = A.Filter(bgp, e_eng)
            object.__setattr__(where, "_fuzz_expr", e_ref)
        delete = _rand_templates(rng, wvars)
        insert = _rand_templates(rng, wvars)
        if not delete and not insert:
            delete = _rand_templates(rng, wvars, 1, 1)
        # WITH <g> (scopes WHERE + default templates) xor USING (merged
        # WHERE default graph) — never both (§3.1.5.3: USING makes WITH
        # ignored for the WHERE; engines vary on the combination)
        wg, dataset = None, ()
        r2 = rng.random()
        if r2 < 0.25:
            wg = iri(rng.choice(GRAPHS))
        elif r2 < 0.4 and not graphed:
            # USING with no USING NAMED makes GRAPH blocks match
            # nothing (engine + spec agree) — keep the regimes separate
            # so GRAPH-block seeds actually exercise the scope switch
            dataset = (tuple(rng.sample(GRAPHS, rng.randint(1, 2))), ())
        return A.Modify(delete=delete, insert=insert, where=where,
                        with_graph=wg, dataset=dataset), None
    if r < 0.95:
        target = rng.choice(["DEFAULT", "NAMED", "ALL",
                             iri(rng.choice(GRAPHS[1:]))])
        return A.Clear(target), None
    gpool = ["DEFAULT"] + [iri(g) for g in GRAPHS[1:]]
    return A.GraphMgmt(rng.choice(["COPY", "MOVE", "ADD"]),
                       rng.choice(gpool), rng.choice(gpool)), None


def _engine_state(gs) -> set:
    return {
        (r["s_lex"], r["p_lex"],
         (int(r["o_kind"]), r["o_lex"],
          r["o_dt"] if r["o_kind"] == KIND_LITERAL else None),
         r["g_lex"])
        for r in gs.quads.collect()
    }


def _run_update_case(spark, seed: int, key_bits):
    from kineo_spark.update import GraphStore

    rng = random.Random(4000 + seed)
    gs = GraphStore(spark, key_bits=key_bits)
    state: set = set()
    history = []
    for step in range(rng.randint(3, 6)):
        op, tuples = _rand_op(rng)
        history.append(op)
        gs.update([op])
        state = _ref_apply(state, op, tuples)
        got = _engine_state(gs)
        assert got == state, (
            f"seed {seed} step {step} kb={key_bits}\nops so far: {history}\n"
            f"extra={got - state}\nmissing={state - got}")


def test_modify_where_union_default_scope(spark):
    """Deterministic pin of the Modify WHERE scope the random seeds do
    not reliably reach: a pattern OUTSIDE any GRAPH block matches quads
    in every named graph (the engine's union-default-graph convention,
    consistent with SELECT), while templates without a graph target
    instantiate into the store default graph."""
    from kineo_spark.update import GraphStore

    s, p, q = iri(NODES[0]), iri(PREDS[0]), iri(PREDS[1])
    o_def, o_named = iri(NODES[1]), iri(NODES[2])
    ops = [
        A.InsertData(((A.TriplePattern(s, p, o_def), None),
                      (A.TriplePattern(s, p, o_named), iri("urn:g:g1")))),
        A.Modify(delete=(), insert=((A.TriplePattern(s, q, A.Var("o")),
                                     None),),
                 where=A.BGP((A.TriplePattern(s, p, A.Var("o")),))),
    ]
    gs = GraphStore(spark).update(ops)
    state: set = set()
    state = _ref_apply(state, ops[0],
                       [(s.lex, p.lex, tt(o_def), G),
                        (s.lex, p.lex, tt(o_named), "urn:g:g1")])
    state = _ref_apply(state, ops[1])
    got = _engine_state(gs)
    assert got == state
    # the named-graph match DID feed the template (union scope) and the
    # instantiation landed in the DEFAULT graph
    assert (s.lex, q.lex, tt(o_named), G) in got
    assert (s.lex, q.lex, tt(o_def), G) in got


def test_modify_with_and_using_scopes(spark):
    """Deterministic pins for WITH (scopes WHERE to one graph and
    re-targets default templates there, §3.1.3) and USING (the WHERE's
    default graph becomes the merge of the USING graphs, §3.1.5.3)."""
    from kineo_spark.update import GraphStore

    s, p, q = iri(NODES[0]), iri(PREDS[0]), iri(PREDS[1])
    o1, o2, o3 = iri(NODES[1]), iri(NODES[2]), iri(NODES[3])
    g1, g2 = "urn:g:g1", "urn:g:g2"
    seed_ops = [A.InsertData((
        (A.TriplePattern(s, p, o1), None),          # default graph
        (A.TriplePattern(s, p, o2), iri(g1)),
        (A.TriplePattern(s, p, o3), iri(g2)),
    ))]
    seed_tuples = [(s.lex, p.lex, tt(o1), G),
                   (s.lex, p.lex, tt(o2), g1),
                   (s.lex, p.lex, tt(o3), g2)]

    # WITH g1: WHERE sees only g1's quad; the insert template lands in g1
    with_op = A.Modify(
        delete=(), insert=((A.TriplePattern(s, q, A.Var("o")), None),),
        where=A.BGP((A.TriplePattern(s, p, A.Var("o")),)),
        with_graph=iri(g1))
    gs = GraphStore(spark).update(seed_ops + [with_op])
    state: set = set()
    state = _ref_apply(state, seed_ops[0], seed_tuples)
    state = _ref_apply(state, with_op)
    got = _engine_state(gs)
    assert got == state
    assert (s.lex, q.lex, tt(o2), g1) in got     # g1 match, landed in g1
    assert not any(r[1] == q.lex and r[3] != g1 for r in got)

    # USING g1 + g2: WHERE's default graph is their merge (the plain
    # default-graph quad is OUT of scope); templates land in the store
    # default graph
    using_op = A.Modify(
        delete=(), insert=((A.TriplePattern(s, q, A.Var("o")), None),),
        where=A.BGP((A.TriplePattern(s, p, A.Var("o")),)),
        dataset=((g1, g2), ()))
    gs2 = GraphStore(spark).update(seed_ops + [using_op])
    state2: set = set()
    state2 = _ref_apply(state2, seed_ops[0], seed_tuples)
    state2 = _ref_apply(state2, using_op)
    got2 = _engine_state(gs2)
    assert got2 == state2
    assert (s.lex, q.lex, tt(o2), G) in got2     # g1 match → default
    assert (s.lex, q.lex, tt(o3), G) in got2     # g2 match → default
    assert (s.lex, q.lex, tt(o1), G) not in got2  # default quad not in scope


@pytest.mark.parametrize("seed", range(12))
def test_update_differential_term_mode(spark, seed):
    _run_update_case(spark, seed, key_bits=None)


@pytest.mark.parametrize("seed,kb", [(s, kb) for s in range(5)
                                     for kb in (64, 128)])
def test_update_differential_id_modes(spark, seed, kb):
    """The same sequences with Modify WHERE evaluated through the
    dictionary compilers — ids in the joins, terms materialized for
    every template variable (update.apply_op key_bits)."""
    _run_update_case(spark, seed, key_bits=kb)
