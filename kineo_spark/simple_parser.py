"""SimpleParser: the reference's line-oriented, stack-based query DSL
(Sources/Kineo/SimpleParser/QueryParser.swift:12-288 and
ExpressionParser.swift:12-139), re-expressed over this repo's algebra.

Each non-empty, non-comment line is one operator. Leaf operators
(``triple``/``quad``/``path``/``nps``) push a pattern; every other
operator pops its operand(s) and pushes the combined algebra. The final
stack top, projected onto its in-scope variables, becomes a SELECT
query. Expressions (``filter``/``extend``/``sort`` operands) use the
same postfix style: ``?v 10 >`` means ``?v > 10``.

Supported lines (reference parity, plus MIN/MAX/SAMPLE/GROUP_CONCAT
aggregates as extensions):

    triple ?s <p> ?o            quad ?s <p> ?o <g>
    path ?s ?o <p> <q> / +      nps ?s ?o <p1> <p2>
    join | union | leftjoin     project ?x ?y
    filter ?v 10 >              extend name ?v 2 *
    agg sum total ?v , count n ?v ; ?g
    avg key name g... | sum ... | count ... | countall name g...
    window rank r , row n ; ?g
    sort ?v , ?w                limit 10
    graph <g> | graph ?g        distinct | reduced
"""

from __future__ import annotations

import re

from kineo_spark import algebra as A
from kineo_spark.expr import EConst, ECall, EVar, Expr, c, fn, v
from kineo_spark.model import PyTerm, blank, iri, lit

_NODE_RE = re.compile(
    r"""^(?:
      \?(?P<var>\w+)
    | <(?P<iri>[^>]*)>
    | _:(?P<bnode>\S+)
    | "(?P<lit>(?:[^"\\]|\\.)*)"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9-]+))?
    | (?P<num>[+-]?(?:\d+\.\d+|\d+))
    | (?P<bool>true|false)
    )$""",
    re.VERBOSE,
)


def parse_node(tok: str):
    """One N-Triples-style node: variable, IRI, bnode, literal, number."""
    m = _NODE_RE.match(tok)
    if not m:
        raise SyntaxError(f"simple: cannot parse node {tok!r}")
    if m.group("var"):
        return A.Var(m.group("var"))
    if m.group("iri") is not None:
        return iri(m.group("iri"))
    if m.group("bnode"):
        return blank(m.group("bnode"))
    if m.group("num"):
        s = m.group("num")
        return lit(s, "decimal" if "." in s else "integer")
    if m.group("bool"):
        return lit(m.group("bool"), "boolean")
    raw = m.group("lit")
    if m.group("dt"):
        from kineo_spark.model import IRI_DT
        d = m.group("dt")
        return lit(raw, IRI_DT.get(d, d))
    if m.group("lang"):
        return PyTerm(2, raw, "langString", m.group("lang"))
    return lit(raw)


_BINOPS = {"||", "&&", "=", "!=", "<", ">", "<=", ">=", "+", "-", "*", "/"}
_UNOPS = {
    "neg": "NEG", "not": "!", "isiri": "ISIRI", "isliteral": "ISLITERAL",
    "isblank": "ISBLANK", "isnumeric": "ISNUMERIC", "lang": "LANG",
    "datatype": "DATATYPE",
}
_CASTS = {"int": "integer", "float": "float", "double": "double"}


def parse_expression(parts: list[str]) -> Expr:
    """Postfix expression, one token per operator/operand
    (ExpressionParser.swift:12-139)."""
    stack: list[Expr] = []

    def pop2():
        if len(stack) < 2:
            raise SyntaxError("simple: not enough expression operands")
        r, l = stack.pop(), stack.pop()
        return l, r

    for s in parts:
        if s in _BINOPS:
            l, r = pop2()
            stack.append(ECall(s, (l, r)))
        elif s == "between":
            if len(stack) < 3:
                raise SyntaxError("simple: not enough operands for between")
            hi, lo, val = stack.pop(), stack.pop(), stack.pop()
            stack.append(ECall("&&", (ECall(">=", (val, lo)), ECall("<=", (val, hi)))))
        elif s in _UNOPS:
            if not stack:
                raise SyntaxError(f"simple: not enough operands for {s}")
            stack.append(ECall(_UNOPS[s], (stack.pop(),)))
        elif s in _CASTS:
            if not stack:
                raise SyntaxError(f"simple: not enough operands for {s}")
            stack.append(fn("CAST", stack.pop(), to=_CASTS[s]))
        else:
            node = parse_node(s)
            stack.append(v(node.name) if isinstance(node, A.Var) else c(node))
    if not stack:
        raise SyntaxError("simple: empty expression")
    return stack.pop()


_PATH_AGGS = {"avg": "AVG", "sum": "SUM", "count": "COUNT", "countall": "COUNT*",
              "min": "MIN", "max": "MAX", "sample": "SAMPLE",
              "group_concat": "GROUP_CONCAT"}
_WINDOWS = {"rank": "RANK", "row": "ROW_NUMBER", "dense_rank": "DENSE_RANK"}


def _parse_path(parts: list[str]) -> A.Path:
    """Postfix property-path builder (QueryParser.swift:228-274)."""
    stack: list[A.Path] = []
    it = iter(parts)
    for s in it:
        if s == "|":
            r, l = stack.pop(), stack.pop()
            stack.append(A.PAlt(l, r))
        elif s == "/":
            r, l = stack.pop(), stack.pop()
            stack.append(A.PSeq(l, r))
        elif s == "^":
            stack.append(A.PInv(stack.pop()))
        elif s == "+":
            stack.append(A.PPlus(stack.pop()))
        elif s == "*":
            stack.append(A.PStar(stack.pop()))
        elif s == "?":
            stack.append(A.PZeroOrOne(stack.pop()))
        elif s == "nps":
            n = int(next(it))
            iris = []
            for _ in range(n):
                link = stack.pop()
                if not isinstance(link, A.PLink):
                    raise SyntaxError("simple: nps operands must be IRIs")
                iris.append(link.iri)
            stack.append(A.PNps(tuple(iris)))
        else:
            term = parse_node(s)
            if isinstance(term, A.Var) or term.kind != 0:
                raise SyntaxError(f"simple: path element must be an IRI: {s!r}")
            stack.append(A.PLink(term))
    if len(stack) != 1:
        raise SyntaxError("simple: malformed property path")
    return stack.pop()


def _group_exprs(groups: list[list[str]]):
    exprs, names = [], []
    for g in groups:
        e = parse_expression(g)
        exprs.append(e)
        names.append(e.name if isinstance(e, EVar) else f"g{len(names)}")
    return tuple(exprs), tuple(names)


def _split(tokens: list[str], sep: str) -> list[list[str]]:
    out: list[list[str]] = [[]]
    for t in tokens:
        if t == sep:
            out.append([])
        else:
            out[-1].append(t)
    return [g for g in out if g]


class SimpleQueryParser:
    """Stack machine over DSL lines (QueryParser.swift:12-288)."""

    def __init__(self) -> None:
        self.stack: list[A.Algebra] = []

    def _pop(self, op: str) -> A.Algebra:
        if not self.stack:
            raise SyntaxError(f"simple: not enough operands for {op}")
        return self.stack.pop()

    def _pop2(self, op: str):
        rhs, lhs = self._pop(op), self._pop(op)
        return lhs, rhs

    def parse_line(self, line: str) -> A.Algebra | None:
        parts = [p for p in line.split(" ") if p and not p.startswith("\t")]
        if not parts or parts[0].startswith("#"):
            return None
        op, rest = parts[0], parts[1:]
        if op == "triple":
            s, p, o = (parse_node(t) for t in rest[:3])
            return A.BGP((A.TriplePattern(s, p, o),))
        if op == "quad":
            s, p, o, g = (parse_node(t) for t in rest[:4])
            return A.Quad(A.QuadPattern(s, p, o, g))
        if op == "path":
            s, o = parse_node(rest[0]), parse_node(rest[1])
            return A.PathPattern(s, _parse_path(rest[2:]), o)
        if op == "nps":
            s, o = parse_node(rest[0]), parse_node(rest[1])
            iris = tuple(parse_node(t) for t in rest[2:])
            return A.PathPattern(s, A.PNps(iris), o)
        if op == "join":
            return A.Join(*self._pop2(op))
        if op == "union":
            return A.Union(*self._pop2(op))
        if op == "leftjoin":
            return A.LeftJoin(*self._pop2(op))
        if op == "project":
            if not rest:
                raise SyntaxError("simple: no projection variables supplied")
            return A.Project(self._pop(op), tuple(t.lstrip("?") for t in rest))
        if op == "filter":
            return A.Filter(self._pop(op), parse_expression(rest))
        if op == "extend":
            return A.Extend(self._pop(op), parse_expression(rest[1:]), rest[0].lstrip("?"))
        if op == "limit":
            return A.Slice(self._pop(op), 0, int(rest[0]))
        if op == "graph":
            return A.NamedGraph(parse_node(rest[0]), self._pop(op))
        if op == "distinct":
            return A.Distinct(self._pop(op))
        if op == "reduced":
            return A.Reduced(self._pop(op))
        if op == "sort":
            comps = tuple(
                A.SortComparator(parse_expression(g)) for g in _split(rest, ",")
            )
            return A.Order(self._pop(op), comps)
        if op == "agg":
            segs = _split(rest, ";")
            aggs = []
            for a in _split(segs[0], ","):
                kind, name = a[0], a[1]
                if kind not in _PATH_AGGS:
                    raise SyntaxError(f"simple: unknown aggregate {kind!r}")
                expr = parse_expression(a[2:]) if kind != "countall" else None
                spec = A.AggSpec(_PATH_AGGS[kind], expr,
                                 exact=_PATH_AGGS[kind] in ("SUM", "AVG"))
                aggs.append((name.lstrip("?"), spec))
            groups, names = _group_exprs(_split(segs[1], ",") if len(segs) > 1 else [])
            return A.Aggregate(self._pop(op), groups, names, tuple(aggs))
        if op == "window":
            segs = _split(rest, ";")
            groups, _ = _group_exprs(_split(segs[1], ",") if len(segs) > 1 else [])
            funcs = []
            # the reference's DSL takes no comparators (WindowApplication
            # with comparators: [], QueryParser.swift:144); Spark demands
            # an ORDER BY, so order over the partition keys (or a
            # constant) — same "arbitrary within ties" semantics
            order = tuple(A.SortComparator(g) for g in groups) or (
                A.SortComparator(c(lit(1, "integer"))),)
            for w in _split(segs[0], ","):
                kind, name = w[0], w[1]
                if kind not in _WINDOWS:
                    raise SyntaxError(f"simple: unknown window function {kind!r}")
                funcs.append(
                    (name.lstrip("?"),
                     A.WindowSpec(_WINDOWS[kind], partition=groups, order=order))
                )
            return A.Window(self._pop(op), tuple(funcs))
        if op in _PATH_AGGS:  # shorthand: "sum key name group..." one-agg form
            if op == "countall":
                name, grp_toks = rest[0], rest[1:]
                spec = A.AggSpec("COUNT*")
            else:
                key, name, grp_toks = rest[0], rest[1], rest[2:]
                spec = A.AggSpec(_PATH_AGGS[op], v(key.lstrip("?")),
                                 exact=_PATH_AGGS[op] in ("SUM", "AVG"))
            groups, names = _group_exprs([[t] for t in grp_toks])
            return A.Aggregate(self._pop(op), groups, names, ((name.lstrip("?"), spec),))
        raise SyntaxError(f"simple: cannot parse query line: {line!r}")

    def parse(self, text: str) -> A.SelectQuery:
        for line in text.splitlines():
            alg = self.parse_line(line)
            if alg is not None:
                self.stack.append(alg)
        if not self.stack:
            raise SyntaxError("simple: empty query")
        alg = self.stack.pop()
        return A.SelectQuery(alg, tuple(sorted(_projectable(alg))))


def _projectable(n) -> set[str]:
    """Projectable variables of the final algebra (reference
    Algebra.projectableVariables): explicit projections and aggregates
    cap the set; otherwise all in-scope binding vars."""
    if isinstance(n, A.Project):
        return set(n.variables)
    if isinstance(n, A.Aggregate):
        return set(n.group_names) | {name for name, _ in n.aggs}
    if isinstance(n, (A.Distinct, A.Reduced, A.Slice, A.Order, A.Filter)):
        return _projectable(n.child)
    from kineo_spark.sparql_parser import _scope_vars

    out: set[str] = set()
    _scope_vars(n, out)
    return out


def parse_simple_query(text: str) -> A.SelectQuery:
    return SimpleQueryParser().parse(text)
