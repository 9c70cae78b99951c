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
    node = _map_children(node, rewrite)
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
