"""Algebra rewrite passes.

Reference: ``SPARQLQueryRewriter`` (9 passes,
/root/reference/Sources/Kineo/SPARQL/QueryRewriting.swift:29-48).
Catalyst already performs most of them on the physical side (constant
folding, filter merge/pushdown, projection pruning, limit pushdown —
SURVEY §4.1 maps each), so we keep only the passes that must happen
BEFORE DataFrame compilation:

- ``expand_paths``: link→triple, inv(link)→flipped triple, alt→union
  at the algebra level (propertyPathExpansion,
  QueryRewriting.swift:278-293) — so simple paths get BGP/star-collapse
  treatment instead of the path-pair machinery.
- ``merge_filters``: Filter(Filter(x,a),b) → Filter(x, a&&b)
  (:214-222); cheap and keeps compiled plans smaller.
- ``fold_constant_filters``: FILTER(true) elision / FILTER(false) → ∅
  for constant expressions without error potential (simplify +
  foldConstantExpressions, :338-367).
"""

from __future__ import annotations

from dataclasses import fields, is_dataclass, replace

import itertools

from kineo_spark import algebra as A
from kineo_spark.expr import EConst, Expr
from kineo_spark.model import PyTerm

# fresh-variable counter for sequence-path midpoints (process-unique)
_MID_COUNTER = itertools.count()


def _map_children(node: A.Algebra, f) -> A.Algebra:
    if not is_dataclass(node):
        return node
    changes = {}
    for fld in fields(node):
        v = getattr(node, fld.name)
        if isinstance(v, A.Algebra):
            nv = f(v)
            if nv is not v:
                changes[fld.name] = nv
    return replace(node, **changes) if changes else node


def rewrite(node: A.Algebra) -> A.Algebra:
    return fold_star_accessors(_rewrite(node))


def _rewrite(node: A.Algebra) -> A.Algebra:
    node = _map_children(node, _rewrite)
    node = expand_paths(node)
    node = merge_filters(node)
    node = fold_constant_filters(node)
    return node


def expand_paths(node: A.Algebra) -> A.Algebra:
    if not isinstance(node, A.PathPattern):
        return node
    p = node.path
    if isinstance(p, A.PLink):
        return A.Quad(A.QuadPattern(node.subject, p.iri, node.object,
                                    node.graph or A.Var("__pg", binding=False)))
    if isinstance(p, A.PInv) and isinstance(p.path, A.PLink):
        return A.Quad(A.QuadPattern(node.object, p.path.iri, node.subject,
                                    node.graph or A.Var("__pg", binding=False)))
    if isinstance(p, A.PAlt):
        return A.Union(
            expand_paths(A.PathPattern(node.subject, p.lhs, node.object, node.graph)),
            expand_paths(A.PathPattern(node.subject, p.rhs, node.object, node.graph)),
        )
    if isinstance(p, A.PSeq):
        # The mid var must NOT use the "__" internal prefix: Compiler._join
        # discovers shared variables via non-"__" columns, so an internal
        # name would compile to a cross join (cross product of step-1
        # subjects × step-2 objects). Use a visible fresh name and Project
        # it away so it never escapes the path pattern.
        mid = A.Var(f"pathmid_{next(_MID_COUNTER)}")
        keep = tuple(dict.fromkeys(
            n.name
            for n in (node.subject, node.object, node.graph)
            if isinstance(n, A.Var) and n.binding
        ))
        return A.Project(
            A.Join(
                expand_paths(A.PathPattern(node.subject, p.lhs, mid, node.graph)),
                expand_paths(A.PathPattern(mid, p.rhs, node.object, node.graph)),
            ),
            keep,
        )
    return node


def merge_filters(node: A.Algebra) -> A.Algebra:
    if isinstance(node, A.Filter) and isinstance(node.child, A.Filter):
        from kineo_spark.expr import ECall
        inner = node.child
        return A.Filter(inner.child, ECall("&&", (inner.expr, node.expr)))
    return node


def _const_truth(e: Expr):
    """True/False for constant boolean expressions, None otherwise.
    Mirrors the reference's ``isConstant`` caution: only fold literals
    that cannot carry error semantics (Expression.swift:960-998)."""
    if isinstance(e, EConst):
        t: PyTerm = e.term
        if t.dt == "boolean":
            return t.lex == "true"
    return None


def fold_constant_filters(node: A.Algebra) -> A.Algebra:
    if not isinstance(node, A.Filter):
        return node
    truth = _const_truth(node.expr)
    if truth is True:
        return node.child
    if truth is False:
        return A.UnionIdentity()
    return node


# ---------------------------------------------------------------------------
# RDF-star accessor folding
# ---------------------------------------------------------------------------

_ACCESSORS = ("SUBJECT", "PREDICATE", "OBJECT")
# nodes an Extend-definition safely flows through: they neither drop
# columns (Project) nor change which rows a variable is bound on
# (joins/OPTIONAL/UNION) — everything else is a barrier with fresh defs
_PASS_THROUGH = (A.Distinct, A.Reduced, A.Slice)


def fold_star_accessors(node: A.Algebra, _defs: dict | None = None) -> A.Algebra:
    """SUBJECT/PREDICATE/OBJECT/isTRIPLE applied to a variable BIND-bound
    to TRIPLE(...) in the same Extend/Filter/Order chain fold to the
    component expression (guarded so all-three-bound, via the internal
    TRIPLECOMP op). Without this, Catalyst's project collapse inlines the
    packed-triple construction into every accessor and the term_key×EBV
    fan-out multiplies the expression tree past the 64 KB codegen cliff."""
    from kineo_spark.expr import ECall

    defs = {} if _defs is None else _defs
    if isinstance(node, A.Extend):
        child = fold_star_accessors(node.child, defs)
        e = _fold_acc_expr(node.expr, defs)
        if isinstance(e, ECall) and e.op == "TRIPLE" and len(e.args) == 3:
            defs[node.name] = e
        else:
            defs.pop(node.name, None)
        return A.Extend(child, e, node.name)
    if isinstance(node, A.Filter):
        child = fold_star_accessors(node.child, defs)
        return A.Filter(child, _fold_acc_expr(node.expr, defs))
    if isinstance(node, A.Order):
        child = fold_star_accessors(node.child, defs)
        comps = tuple(
            replace(c, expr=_fold_acc_expr(c.expr, defs))
            for c in node.comparators
        )
        return A.Order(child, comps)
    if isinstance(node, _PASS_THROUGH):
        return replace(node, child=fold_star_accessors(node.child, defs))
    return _map_children(node, lambda c: fold_star_accessors(c))


def _triple_def(arg, defs: dict):
    from kineo_spark.expr import ECall, EVar

    if isinstance(arg, ECall) and arg.op == "TRIPLE" and len(arg.args) == 3:
        return arg
    if isinstance(arg, EVar):
        return defs.get(arg.name)
    return None


def _fold_acc_expr(e, defs: dict):
    from kineo_spark.expr import ECall, EVar

    if not isinstance(e, ECall):
        return e
    args = tuple(_fold_acc_expr(x, defs) for x in e.args)
    if e.op in _ACCESSORS and len(args) == 1:
        t = _triple_def(args[0], defs)
        if t is not None:
            return ECall("TRIPLECOMP", t.args,
                         (("comp", _ACCESSORS.index(e.op)),))
    if e.op == "ISTRIPLE" and len(args) == 1:
        t = _triple_def(args[0], defs)
        if t is not None:
            # isTRIPLE(TRIPLE(a,b,c)) ≡ true when all three bound, ERROR
            # otherwise (TRIPLE propagates unbound) — exact via the
            # internal all-bound-or-error op
            return ECall("ALLBOUNDTRUE", t.args)
    if args != e.args:
        return ECall(e.op, args, e.kwargs)
    return e
