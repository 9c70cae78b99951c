"""Algebra → SPARQL text serialization (minimal).

Used by SERVICE federation to ship a sub-pattern to a remote endpoint
(reference serializes the subalgebra back to SPARQL,
QueryPlanner.swift:819-833). Covers the pattern subset that is useful to
federate: BGPs, FILTER, UNION, OPTIONAL, VALUES, MINUS,
FILTER (NOT) EXISTS, BIND, GRAPH (r12). Scope discipline: operands that
flatten into an enclosing group are braced whenever their flat form
would emit a group-level FILTER (r12 round-trip-fuzz find — SPARQL
filters apply to the whole surrounding group, so an unbraced
Join(Filter(A, e), B) re-parses with e scoped over B too), and BIND
children brace their filters because BIND is positional while FILTER
is group-wide. Pinned by the algebra-to-text-to-parse differential
(tests/test_text_roundtrip_differential.py).
"""

from __future__ import annotations

from kineo_spark import algebra as A
from kineo_spark.expr import EConst, ECall, EVar, Expr
from kineo_spark.model import PyTerm


def _node(n) -> str:
    if isinstance(n, A.Var):
        return f"?{n.name}" if n.binding else "[]"
    assert isinstance(n, PyTerm)
    return n.n3()


_INFIX = {"&&", "||", "=", "!=", "<", "<=", ">", ">=", "+", "-", "*", "/"}


def _expr(e: Expr) -> str:
    if isinstance(e, EVar):
        return f"?{e.name}"
    if isinstance(e, EConst):
        return e.term.n3()
    assert isinstance(e, ECall)
    if e.op in _INFIX and len(e.args) == 2:
        return f"({_expr(e.args[0])} {e.op} {_expr(e.args[1])})"
    if e.op == "!":
        return f"(!{_expr(e.args[0])})"
    args = ", ".join(_expr(a) for a in e.args)
    return f"{e.op}({args})"


def _has_group_filter(a: A.Algebra) -> bool:
    """True when ``a``'s serialization emits a FILTER at ITS OWN group
    level — flattened into an enclosing group, that filter would escape
    its algebraic scope (SPARQL filters apply to the whole surrounding
    group). Union arms and OPTIONAL right sides brace themselves;
    Join/LeftJoin operands flatten, so they must be checked
    transitively. r12 round-trip-fuzz find: Join(Filter(A, BOUND(?x)),
    B) shipped flat to a SERVICE endpoint evaluates BOUND against B's
    bindings too."""
    if isinstance(a, (A.Filter, A.SemiJoin)):
        return True  # SemiJoin serializes as FILTER (NOT) EXISTS
    if isinstance(a, A.Join):
        return _has_group_filter(a.lhs) or _has_group_filter(a.rhs)
    if isinstance(a, (A.LeftJoin, A.Minus)):
        return _has_group_filter(a.lhs)  # rhs braces itself
    return False  # Extend braces its own child (see _pattern); Union/
    #               NamedGraph/Table/BGP are self-contained


def _operand(a: A.Algebra) -> str:
    """Serialize a Join/LeftJoin-lhs operand, bracing it when flat
    serialization would leak a group-level FILTER into the parent."""
    if _has_group_filter(a):
        return f"{{ {_pattern(a)} }}"
    return _pattern(a)


def _pattern(a: A.Algebra) -> str:
    if isinstance(a, A.BGP):
        return " .\n".join(
            f"{_node(t.s)} {_node(t.p)} {_node(t.o)}" for t in a.patterns
        ) + " ."
    if isinstance(a, A.Triple):
        t = a.pattern
        return f"{_node(t.s)} {_node(t.p)} {_node(t.o)} ."
    if isinstance(a, A.Filter):
        return f"{_pattern(a.child)}\nFILTER({_expr(a.expr)})"
    if isinstance(a, A.Join):
        return f"{_operand(a.lhs)}\n{_operand(a.rhs)}"
    if isinstance(a, A.Union):
        return f"{{ {_pattern(a.lhs)} }} UNION {{ {_pattern(a.rhs)} }}"
    if isinstance(a, A.LeftJoin):
        f = f" FILTER({_expr(a.expr)})" if a.expr is not None else ""
        return f"{_operand(a.lhs)}\nOPTIONAL {{ {_pattern(a.rhs)}{f} }}"
    if isinstance(a, A.Minus):
        return f"{_operand(a.lhs)}\nMINUS {{ {_pattern(a.rhs)} }}"
    if isinstance(a, A.SemiJoin):
        kw = "FILTER NOT EXISTS" if a.anti else "FILTER EXISTS"
        return f"{_operand(a.lhs)}\n{kw} {{ {_pattern(a.rhs)} }}"
    if isinstance(a, A.Extend):
        # BIND is POSITIONAL (the group-so-far), unlike FILTER (whole
        # group): a filter inside the child must stay braced or the
        # re-parsed filter would see the BIND variable
        return f"{_operand(a.child)}\nBIND({_expr(a.expr)} AS ?{a.name})"
    if isinstance(a, A.NamedGraph):
        return f"GRAPH {_node(a.graph)} {{ {_pattern(a.child)} }}"
    if isinstance(a, A.Table):
        header = " ".join(f"?{v}" for v in a.variables)
        rows = " ".join(
            "(" + " ".join("UNDEF" if t is None else t.n3() for t in row) + ")"
            for row in a.rows
        )
        return f"VALUES ({header}) {{ {rows} }}"
    raise NotImplementedError(f"cannot serialize {type(a).__name__} to SPARQL")


def algebra_to_sparql(a: A.Algebra) -> str:
    return "SELECT * WHERE {\n" + _pattern(a) + "\n}"
