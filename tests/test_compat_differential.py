"""Differential fuzz for compatibility-join semantics (SURVEY §7.4
hard part #2): random algebra trees of Join / LeftJoin(expr) / MINUS /
UNION over random BGPs and VALUES tables with UNDEF cells (partial
bindings), engine vs an independent Python implementation of SPARQL 1.1
§18.5 written from the spec (compatible-mappings bag join, LeftJoin =
Filter(Join) ∪ Diff with error-as-not-true, MINUS with the
dom-disjointness rule) — the same evidence class as
test_path_differential.py, aimed at the hardest semantic corner:
unbound shared variables. Runs in term mode and through the id64/id128
dictionary compilers (reference semantics:
MaterializedQueryPlan.swift:444-484 DiffPlan, :554-569 MinusPlan;
ResultProtocol.join QuadStore.swift:587)."""

import random
from collections import Counter

import pytest

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import c, v
from kineo_spark.forms import select
from kineo_spark.model import iri
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
PREDS = [EX + "p", EX + "q"]
NODES = [EX + f"n{i}" for i in range(5)]
VARS = ["va", "vb", "vc", "vd"]
G = "urn:g:default"


# --- independent reference evaluator (spec, §18.5) --------------------------
# Mappings are dicts var->lex; bag = Counter keyed by sorted item tuples.

def _key(m: dict) -> tuple:
    return tuple(sorted(m.items()))


def _compatible(m1: dict, m2: dict) -> bool:
    return all(m1[k] == m2[k] for k in m1.keys() & m2.keys())


def _ev_expr(expr, m: dict):
    """Evaluate the (tiny) expression language: returns True, False, or
    'error' (unbound operand → type error per §17.2/§17.3, which
    LeftJoin treats as not-true)."""
    if expr is None:
        return True
    kind = expr[0]
    if kind == "eq_const":
        _, var, lex = expr
        if var not in m:
            return "error"
        return m[var] == lex
    if kind == "eq_var":
        _, v1, v2 = expr
        if v1 not in m or v2 not in m:
            return "error"
        return m[v1] == m[v2]
    raise NotImplementedError(kind)


def _join(b1: Counter, b2: Counter) -> Counter:
    out = Counter()
    for k1, n1 in b1.items():
        d1 = dict(k1)
        for k2, n2 in b2.items():
            d2 = dict(k2)
            if _compatible(d1, d2):
                out[_key(d1 | d2)] += n1 * n2
    return out


def _leftjoin(b1: Counter, b2: Counter, expr) -> Counter:
    """LeftJoin(Ω1, Ω2, expr) = Filter(expr, Join(Ω1,Ω2)) ∪
    Diff(Ω1, Ω2, expr): μ1 survives alone iff NO compatible μ2 passes
    expr (false and error both count as not-true)."""
    out = Counter()
    for k1, n1 in b1.items():
        d1 = dict(k1)
        matched = 0
        for k2, n2 in b2.items():
            d2 = dict(k2)
            if _compatible(d1, d2):
                merged = d1 | d2
                if _ev_expr(expr, merged) is True:
                    out[_key(merged)] += n1 * n2
                    matched += n2
        if matched == 0:
            out[k1] += n1
    return out


def _minus(b1: Counter, b2: Counter) -> Counter:
    """§18.5: μ survives unless some μ' is compatible AND shares at
    least one variable (dom-disjoint mappings do NOT exclude)."""
    out = Counter()
    for k1, n1 in b1.items():
        d1 = dict(k1)
        excluded = any(
            _compatible(d1, dict(k2)) and (d1.keys() & dict(k2).keys())
            for k2 in b2)
        if not excluded:
            out[k1] += n1
    return out


def _unify(pat: A.TriplePattern, s, p, o):
    m = {}
    for node, val in ((pat.s, s), (pat.p, p), (pat.o, o)):
        if isinstance(node, A.Var):
            if node.name in m and m[node.name] != val:
                return None
            m[node.name] = val
        elif node.lex != val:
            return None
    return m


def ref_eval(alg, quads, graph: str = G) -> Counter:
    if isinstance(alg, A.BGP):
        b = Counter({(): 1})
        for pat in alg.patterns:
            matches = Counter()
            for s, p, o, g in quads:
                if g != graph:
                    continue
                m = _unify(pat, s, p, o)
                if m is not None:
                    matches[_key(m)] += 1
            b = _join(b, matches)
        return b
    if isinstance(alg, A.Table):
        b = Counter()
        for row in alg.rows:
            m = {var: t.lex for var, t in zip(alg.variables, row)
                 if t is not None}
            b[_key(m)] += 1
        return b
    if isinstance(alg, A.PathPattern):
        # reuse the spec-derived §18.4 path evaluator from the path
        # differential — paths as leaves inside compat trees tie the
        # two evidence classes together
        from tests.test_path_differential import ref_eval as path_ref
        out = Counter()
        for (s_, o_), n in path_ref(alg.path, quads, graph).items():
            if alg.subject.name == alg.object.name:
                if s_ == o_:
                    out[_key({alg.subject.name: s_})] += n
            else:
                out[_key({alg.subject.name: s_,
                          alg.object.name: o_})] += n
        return out
    if isinstance(alg, A.Join):
        return _join(ref_eval(alg.lhs, quads, graph), ref_eval(alg.rhs, quads, graph))
    if isinstance(alg, A.LeftJoin):
        return _leftjoin(ref_eval(alg.lhs, quads, graph), ref_eval(alg.rhs, quads, graph),
                         getattr(alg, "_fuzz_expr", None))
    if isinstance(alg, A.Minus):
        return _minus(ref_eval(alg.lhs, quads, graph), ref_eval(alg.rhs, quads, graph))
    if isinstance(alg, A.Union):
        return ref_eval(alg.lhs, quads, graph) + ref_eval(alg.rhs, quads, graph)
    if isinstance(alg, A.SemiJoin):
        # FILTER (NOT) EXISTS, decorrelated compat form — the semantics
        # BOTH this engine and the reference implement (ExistsPlan,
        # MaterializedQueryPlan.swift:1617-1660): μ survives iff some
        # (no) compatible μ' exists in the rhs
        b1, b2 = ref_eval(alg.lhs, quads, graph), ref_eval(alg.rhs, quads, graph)
        out = Counter()
        for k1, n1 in b1.items():
            d1 = dict(k1)
            hit = any(_compatible(d1, dict(k2)) for k2 in b2)
            if hit != alg.anti:
                out[k1] += n1
        return out
    if isinstance(alg, A.Filter):
        # §17.2 EBV over the expression: false AND error both drop
        return Counter({k: n for k, n in ref_eval(alg.child, quads, graph).items()
                        if _ev_expr(alg._fuzz_expr, dict(k)) is True})
    if isinstance(alg, A.Extend):
        # BIND: expression error leaves the variable UNBOUND
        # (MaterializedQueryPlan.swift:501-513); our exprs yield
        # xsd:boolean terms whose lex matches the engine's lit_bool_col
        out = Counter()
        for k, n in ref_eval(alg.child, quads, graph).items():
            d = dict(k)
            r = _ev_expr(alg._fuzz_expr, d)
            if r != "error":
                d[alg.name] = "true" if r else "false"
            out[_key(d)] += n
        return out
    raise NotImplementedError(type(alg).__name__)


# --- random generators -------------------------------------------------------

def rand_quads(rng: random.Random):
    quads = set()
    for _ in range(rng.randint(6, 12)):
        quads.add((rng.choice(NODES), rng.choice(PREDS),
                   rng.choice(NODES), G))
    return sorted(quads)


def rand_bgp(rng: random.Random) -> A.BGP:
    pats = []
    for _ in range(rng.randint(1, 2)):
        s = (A.Var(rng.choice(VARS)) if rng.random() < 0.8
             else iri(rng.choice(NODES)))
        o = (A.Var(rng.choice(VARS)) if rng.random() < 0.8
             else iri(rng.choice(NODES)))
        pats.append(A.TriplePattern(s, iri(rng.choice(PREDS)), o))
    return A.BGP(tuple(pats))


def rand_table(rng: random.Random) -> A.Table:
    vs = tuple(rng.sample(VARS, rng.randint(1, 3)))
    rows = tuple(
        tuple(iri(rng.choice(NODES)) if rng.random() < 0.7 else None
              for _ in vs)
        for _ in range(rng.randint(1, 5)))
    return A.Table(vs, rows)


def rand_expr(rng: random.Random):
    """Returns (engine_expr, ref_expr). Deliberately references vars
    that may be UNBOUND in the merged mapping — the error-as-not-true
    corner of LeftJoin."""
    r = rng.random()
    if r < 0.4:
        return None, None
    if r < 0.7:
        var, node = rng.choice(VARS), rng.choice(NODES)
        return v(var) == c(iri(node)), ("eq_const", var, node)
    v1, v2 = rng.sample(VARS, 2)
    return v(v1) == v(v2), ("eq_var", v1, v2)


EVARS = ["ex", "ey"]  # BIND targets — boolean terms, maybe-unbound


def rand_path_leaf(rng: random.Random) -> A.PathPattern:
    from tests.test_path_differential import rand_path
    x, y = rng.choice(VARS), rng.choice(VARS)  # may coincide (diagonal)
    return A.PathPattern(A.Var(x), rand_path(rng, 1), A.Var(y))


def rand_alg(rng: random.Random, depth: int):
    if depth == 0:
        r = rng.random()
        if r < 0.2:
            return rand_path_leaf(rng)
        return rand_bgp(rng) if r < 0.6 else rand_table(rng)
    r = rng.random()
    if r < 0.15:
        # FILTER: our exprs reference maybe-unbound vars, so this
        # exercises error-drops-row alongside plain false-drops-row
        child = rand_alg(rng, depth - 1)
        e_eng, e_ref = rand_expr(rng)
        while e_eng is None:
            e_eng, e_ref = rand_expr(rng)
        node = A.Filter(child, e_eng)
        object.__setattr__(node, "_fuzz_expr", e_ref)
        return node
    if r < 0.3:
        # BIND: error → unbound; two subtrees extending the SAME name
        # later joined make a maybe-unbound boolean shared var
        child = rand_alg(rng, depth - 1)
        free = [v_ for v_ in EVARS if v_ not in all_vars(child)]
        if free:
            e_eng, e_ref = rand_expr(rng)
            while e_eng is None:
                e_eng, e_ref = rand_expr(rng)
            node = A.Extend(child, e_eng, rng.choice(free))
            object.__setattr__(node, "_fuzz_expr", e_ref)
            return node
        # fall through to a binary op when both names are taken
    op = rng.choice(["join", "left", "left", "minus", "union",
                     "semi", "anti"])
    lhs, rhs = rand_alg(rng, depth - 1), rand_alg(rng, depth - 1)
    if op == "join":
        return A.Join(lhs, rhs)
    if op in ("semi", "anti"):
        return A.SemiJoin(lhs, rhs, anti=(op == "anti"))
    if op == "left":
        e_eng, e_ref = rand_expr(rng)
        node = A.LeftJoin(lhs, rhs, e_eng)
        # smuggle the ref-side expr tuple past the frozen dataclass
        object.__setattr__(node, "_fuzz_expr", e_ref)
        return node
    if op == "minus":
        return A.Minus(lhs, rhs)
    return A.Union(lhs, rhs)


def all_vars(alg) -> set:
    if isinstance(alg, A.BGP):
        return {n.name for p in alg.patterns
                for n in (p.s, p.p, p.o) if isinstance(n, A.Var)}
    if isinstance(alg, A.Table):
        return set(alg.variables)
    if isinstance(alg, A.PathPattern):
        return {alg.subject.name, alg.object.name}
    if isinstance(alg, A.SemiJoin):
        return all_vars(alg.lhs)  # rhs vars do not project out of EXISTS
    if isinstance(alg, A.Filter):
        return all_vars(alg.child)
    if isinstance(alg, A.Extend):
        return all_vars(alg.child) | {alg.name}
    return all_vars(alg.lhs) | all_vars(alg.rhs)


def _short(x):
    return x.rsplit("/", 1)[-1] if x else x


def _run_case(spark, seed: int, compile_df):
    rng = random.Random(7000 + seed)
    quads = rand_quads(rng)
    alg = rand_alg(rng, 2)
    proj = tuple(sorted(all_vars(alg)))
    store = QuadsDataFrameStore.from_rows(
        spark, [(0, s, p, 0, o, None, None, None, g) for s, p, o, g in quads])

    df = compile_df(store, A.SelectQuery(alg, proj))
    got = Counter()
    for r in df.collect():
        got[tuple(
            _short(r[var]["lex"]) if r[var] is not None
            and r[var]["lex"] is not None else None
            for var in proj)] += 1

    want = Counter()
    for k, n in ref_eval(alg, quads).items():
        d = dict(k)
        want[tuple(_short(d.get(var)) for var in proj)] += n

    assert got == want, (
        f"seed {seed}: alg {alg}\nquads {quads}\nproj {proj}\n"
        f"extra={got - want}\nmissing={want - got}")


@pytest.mark.parametrize("seed", range(14))
def test_compat_differential_term_mode(spark, seed):
    def compile_df(store, q):
        return select(Compiler(store), q)
    _run_case(spark, seed, compile_df)


@pytest.mark.parametrize("seed,kb", [(s, kb) for s in range(6)
                                     for kb in (64, 128)])
def test_compat_differential_id_modes(spark, seed, kb):
    """The same spec-reference differential through the dictionary
    compilers at both key widths: table terms intern as struct binders,
    the compat encoding must agree on ids exactly as on terms."""
    from kineo_spark.dictionary import id_compiler

    def compile_df(store, q):
        comp = id_compiler(store, key_bits=kb)
        comp.prepare(q)
        return select(comp, q)
    _run_case(spark, seed, compile_df)


# --- GRAPH ?g around compat trees (dataset semantics × unbound vars) --------

GRAPHS = ["urn:g:g1", "urn:g:g2"]


def rand_quads_multi(rng: random.Random):
    quads = set()
    for _ in range(rng.randint(8, 14)):
        quads.add((rng.choice(NODES), rng.choice(PREDS),
                   rng.choice(NODES), rng.choice(GRAPHS)))
    return sorted(quads)


@pytest.mark.parametrize("seed", range(8))
def test_compat_differential_graph_scoped(spark, seed):
    """GRAPH ?g { <random compat tree> }: §13.3 — the tree evaluates
    once per named graph with BGPs scoped to that graph (VALUES tables
    are graph-transparent), each solution extended with ?g. Every
    compat corner above now also runs under per-graph scoping."""
    rng = random.Random(9000 + seed)
    quads = rand_quads_multi(rng)
    tree = rand_alg(rng, 2)
    alg = A.NamedGraph(A.Var("g"), tree)
    proj = ("g",) + tuple(sorted(all_vars(tree)))
    store = QuadsDataFrameStore.from_rows(
        spark, [(0, s, p, 0, o, None, None, None, g) for s, p, o, g in quads])

    df = select(Compiler(store), A.SelectQuery(alg, proj))
    got = Counter()
    for r in df.collect():
        got[tuple(
            _short(r[var]["lex"]) if r[var] is not None
            and r[var]["lex"] is not None else None
            for var in proj)] += 1

    want = Counter()
    for g in GRAPHS:
        for k, n in ref_eval(tree, quads, g).items():
            d = dict(k)
            d["g"] = g
            want[tuple(_short(d.get(var)) for var in proj)] += n

    assert got == want, (
        f"seed {seed}: tree {tree}\nquads {quads}\nproj {proj}\n"
        f"extra={got - want}\nmissing={want - got}")


@pytest.mark.parametrize("seed,kb", [(s, kb) for s in range(5)
                                     for kb in (64, 128)])
def test_compat_differential_graph_scoped_id_modes(spark, seed, kb):
    """The GRAPH ?g compat family through the dictionary compilers at
    both key widths — completes the matrix (term/id64/id128 × plain/
    graph-scoped)."""
    from kineo_spark.dictionary import id_compiler

    rng = random.Random(9000 + seed)  # same trees as the term seeds
    quads = rand_quads_multi(rng)
    tree = rand_alg(rng, 2)
    alg = A.NamedGraph(A.Var("g"), tree)
    proj = ("g",) + tuple(sorted(all_vars(tree)))
    store = QuadsDataFrameStore.from_rows(
        spark, [(0, s, p, 0, o, None, None, None, g) for s, p, o, g in quads])

    q = A.SelectQuery(alg, proj)
    comp = id_compiler(store, key_bits=kb)
    comp.prepare(q)
    df = select(comp, q)
    got = Counter()
    for r in df.collect():
        got[tuple(
            _short(r[var]["lex"]) if r[var] is not None
            and r[var]["lex"] is not None else None
            for var in proj)] += 1

    want = Counter()
    for g in GRAPHS:
        for k, n in ref_eval(tree, quads, g).items():
            d = dict(k)
            d["g"] = g
            want[tuple(_short(d.get(var)) for var in proj)] += n

    assert got == want, (
        f"seed {seed} kb {kb}: tree {tree}\nquads {quads}\n"
        f"extra={got - want}\nmissing={want - got}")
