"""SPARQL algebra as Python dataclasses.

Mirrors the reference algebra enumerated at
/root/reference/Sources/Kineo/SPARQL/QueryRewriting.swift:295-320
(plus ``.reduced`` from SPARQL/Query.swift:110):

    unionIdentity | joinIdentity | table | quad | triple | bgp
    | innerJoin | leftOuterJoin(expr) | filter(expr) | union
    | namedGraph(node) | extend(expr,name) | minus | project(vars)
    | distinct | reduced | service(url,silent) | slice(offset,limit)
    | order([SortComparator]) | path(node,PropertyPath,node)
    | aggregate(groups,aggs) | window(funcs) | subquery(Query)

The compiler (compiler.py) lowers each node to a DataFrame; Catalyst
then owns physical planning (join order/strategy, pushdown, codegen) —
replacing the reference's QueryPlanner/cost model wholesale (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union as U

from kineo_spark.model import PyTerm

# ---------------------------------------------------------------------------
# Patterns
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    """Named variable; binding=False models non-binding vars ([] syntax)
    (reference: Node.variable(_, binding:), SPARQL/Query.swift:42-63)."""

    name: str
    binding: bool = True


Node = U[Var, PyTerm]


@dataclass(frozen=True)
class QuadPattern:
    s: Node
    p: Node
    o: Node
    g: Node  # graph position; compiler substitutes the active graph

    def nodes(self):
        return [("s", self.s), ("p", self.p), ("o", self.o), ("g", self.g)]

    def variables(self) -> set[str]:
        return {n.name for _, n in self.nodes() if isinstance(n, Var) and n.binding}


@dataclass(frozen=True)
class TriplePattern:
    s: Node
    p: Node
    o: Node


# ---------------------------------------------------------------------------
# Property paths (SURVEY §2.8)
# ---------------------------------------------------------------------------


class Path:
    pass


@dataclass(frozen=True)
class PLink(Path):
    iri: PyTerm


@dataclass(frozen=True)
class PInv(Path):
    path: Path


@dataclass(frozen=True)
class PSeq(Path):
    lhs: Path
    rhs: Path


@dataclass(frozen=True)
class PAlt(Path):
    lhs: Path
    rhs: Path


@dataclass(frozen=True)
class PNps(Path):
    """Negated property set !(iri1|iri2|...)."""

    iris: tuple[PyTerm, ...]


@dataclass(frozen=True)
class PPlus(Path):
    path: Path


@dataclass(frozen=True)
class PStar(Path):
    path: Path


@dataclass(frozen=True)
class PZeroOrOne(Path):
    path: Path


# ---------------------------------------------------------------------------
# Algebra nodes
# ---------------------------------------------------------------------------


class Algebra:
    pass


@dataclass(frozen=True)
class JoinIdentity(Algebra):
    """Single empty solution (joinIdentity)."""


@dataclass(frozen=True)
class UnionIdentity(Algebra):
    """Empty solution sequence (unionIdentity)."""


@dataclass(frozen=True)
class Table(Algebra):
    """VALUES / inline data: rows of optional terms per variable."""

    variables: tuple[str, ...]
    rows: tuple[tuple[Optional[PyTerm], ...], ...]


@dataclass(frozen=True)
class Quad(Algebra):
    pattern: QuadPattern


@dataclass(frozen=True)
class Triple(Algebra):
    pattern: TriplePattern


@dataclass(frozen=True)
class BGP(Algebra):
    patterns: tuple[TriplePattern, ...]


@dataclass(frozen=True)
class Join(Algebra):
    lhs: Algebra
    rhs: Algebra


@dataclass(frozen=True)
class LeftJoin(Algebra):
    """OPTIONAL with an attached filter expression (compat semantics:
    reference MaterializedQueryPlan.swift:444-484 DiffPlan +
    QueryPlanner.swift:480-552)."""

    lhs: Algebra
    rhs: Algebra
    expr: Optional["Expr"] = None


@dataclass(frozen=True)
class Minus(Algebra):
    """SPARQL MINUS incl. the domain-disjointness rule
    (MaterializedQueryPlan.swift:554-569)."""

    lhs: Algebra
    rhs: Algebra


@dataclass(frozen=True)
class SemiJoin(Algebra):
    """FILTER EXISTS — decorrelated form (reference ExistsPlan,
    MaterializedQueryPlan.swift:1617-1660)."""

    lhs: Algebra
    rhs: Algebra
    anti: bool = False  # True → FILTER NOT EXISTS


@dataclass(frozen=True)
class Filter(Algebra):
    child: Algebra
    expr: "Expr"


@dataclass(frozen=True)
class Union(Algebra):
    lhs: Algebra
    rhs: Algebra


@dataclass(frozen=True)
class NamedGraph(Algebra):
    """GRAPH <iri> { } or GRAPH ?g { }."""

    graph: Node
    child: Algebra


@dataclass(frozen=True)
class Extend(Algebra):
    child: Algebra
    expr: "Expr"
    name: str


@dataclass(frozen=True)
class Project(Algebra):
    child: Algebra
    variables: tuple[str, ...]


@dataclass(frozen=True)
class Distinct(Algebra):
    child: Algebra


@dataclass(frozen=True)
class Reduced(Algebra):
    child: Algebra


@dataclass(frozen=True)
class Slice(Algebra):
    child: Algebra
    offset: int = 0
    limit: Optional[int] = None


@dataclass(frozen=True)
class SortComparator:
    expr: "Expr"
    ascending: bool = True


@dataclass(frozen=True)
class Order(Algebra):
    child: Algebra
    comparators: tuple[SortComparator, ...]


@dataclass(frozen=True)
class PathPattern(Algebra):
    subject: Node
    path: Path
    object: Node
    graph: Optional[Node] = None


@dataclass(frozen=True)
class AggSpec:
    """One aggregate: op ∈ COUNT, COUNT*, SUM, AVG, MIN, MAX, SAMPLE,
    GROUP_CONCAT (reference AggregationPlan,
    MaterializedQueryPlan.swift:2183-2559)."""

    op: str
    expr: Optional["Expr"] = None
    distinct: bool = False
    separator: str = " "
    # exact=True routes SUM/AVG through DECIMAL(25,6) accumulation so the
    # result is order-independent (needed for oracle hash-matching and a
    # good idea on a 1000-executor cluster anyway).
    exact: bool = False
    # APPROX_QUANTILE extension: the quantile in [0,1] (and for
    # APPROX_COUNT_DISTINCT-style sketches, a place for a parameter)
    quantile: float = 0.5


@dataclass(frozen=True)
class Aggregate(Algebra):
    child: Algebra
    groups: tuple["Expr", ...]
    group_names: tuple[str, ...]
    aggs: tuple[tuple[str, AggSpec], ...]  # (result var, spec)


@dataclass(frozen=True)
class WindowSpec:
    op: str  # RANK | DENSE_RANK | ROW_NUMBER | NTILE | agg ops
    expr: Optional["Expr"] = None
    n: Optional[int] = None  # for NTILE
    partition: tuple["Expr", ...] = ()
    order: tuple[SortComparator, ...] = ()
    # frame: ROWS (reference parity) or RANGE — an EXTENSION past the
    # reference, which throws on RANGE (MaterializedQueryPlan.swift:
    # 849-852); Spark's native rangeBetween makes it free here. RANGE
    # requires a single numeric ORDER BY key (SQL-standard restriction).
    # None bounds = unbounded.
    frame_type: str = "ROWS"
    frame_start: Optional[int] = None  # negative = preceding
    frame_end: Optional[int] = None
    # exact=True: SUM/AVG accumulate in DECIMAL(25,6) (order-independent)
    exact: bool = False


@dataclass(frozen=True)
class Window(Algebra):
    child: Algebra
    functions: tuple[tuple[str, WindowSpec], ...]


@dataclass(frozen=True)
class Service(Algebra):
    endpoint: str
    child: Algebra
    silent: bool = False


@dataclass(frozen=True)
class Subquery(Algebra):
    query: "SelectQuery"


# Query forms -----------------------------------------------------------------


@dataclass(frozen=True)
class SelectQuery:
    algebra: Algebra
    variables: tuple[str, ...] = ()  # empty = SELECT *
    # FROM / FROM NAMED clauses: () = none, else (defaults, named) with
    # each a tuple of graph-IRI strings (SPARQL 1.1 §13.2)
    dataset: tuple = ()


@dataclass(frozen=True)
class AskQuery:
    algebra: Algebra
    dataset: tuple = ()


@dataclass(frozen=True)
class ConstructQuery:
    algebra: Algebra
    template: tuple[TriplePattern, ...] = ()
    dataset: tuple = ()


@dataclass(frozen=True)
class DescribeQuery:
    algebra: Algebra
    nodes: tuple[Node, ...] = ()
    dataset: tuple = ()


# SPARQL 1.1 Update operations (EXTENSION: the reference declares
# sparqlUpdate11 — SPARQL/Query.swift:25 — but no evaluator supports it;
# QueryPlanner.swift:1075-1076 lists only query10/query11) -------------------

# a quad in a template/data block: triple + graph (None = default graph)
# QuadSpec = tuple[TriplePattern, Node | None]


@dataclass(frozen=True)
class InsertData:
    quads: tuple  # of (TriplePattern, PyTerm | None) — ground terms only


@dataclass(frozen=True)
class DeleteData:
    quads: tuple  # ground, no blank nodes (spec §3.1.2)


@dataclass(frozen=True)
class Modify:
    """DELETE/INSERT WHERE (and the DELETE WHERE shorthand): bindings
    come from the pre-state, deletes apply before inserts."""
    delete: tuple  # of (TriplePattern, Node | None) templates
    insert: tuple
    where: Algebra
    with_graph: object | None = None  # WITH <g>: active graph + template default
    dataset: tuple = ()  # USING / USING NAMED: (defaults, named) lex tuples


@dataclass(frozen=True)
class Clear:
    target: object  # "DEFAULT" | "NAMED" | "ALL" | PyTerm (also DROP)
    silent: bool = False


@dataclass(frozen=True)
class Create:
    graph: object  # no-op: graphs exist implicitly in the quads layout
    silent: bool = False


@dataclass(frozen=True)
class GraphMgmt:
    """COPY / MOVE / ADD (SPARQL 1.1 Update §3.2.3-3.2.5): whole-graph
    data movement between the default graph and named graphs."""
    op: str            # "COPY" | "MOVE" | "ADD"
    src: object        # "DEFAULT" | PyTerm
    dst: object
    silent: bool = False


@dataclass(frozen=True)
class LoadOp:
    source: str  # file path/IRI; format by extension (.nt/.nq/.ttl/.rdf)
    graph: object | None = None
    silent: bool = False


def may_bind_vars(node) -> frozenset:
    """Variables that can appear in dom(μ) of this subtree's solutions —
    SYNTACTIC binding occurrences only (pattern positions, VALUES
    columns with ≥1 bound row, BIND targets, path endpoints, aggregate
    and window outputs), never mere FILTER-expression mentions, and
    restricted by Project/Subquery. Used by the compiler's MINUS
    dom-disjointness test under ``GRAPH ?var`` (ADVICE r11): the
    threaded active-graph column makes ?var LOOK shared by both
    operands, but per §18.1.7 it only counts toward domain overlap when
    the pattern itself can bind it on both sides. Overapproximation
    here would wrongly cancel (the threaded column is never null), so
    each case lists exactly the dom-contributing positions."""
    def _var(n) -> frozenset:
        if isinstance(n, Var) and n.binding:
            return frozenset({n.name})
        return frozenset()

    if isinstance(node, Quad):
        return frozenset(node.pattern.variables())
    if isinstance(node, Triple):
        p = node.pattern
        return _var(p.s) | _var(p.p) | _var(p.o)
    if isinstance(node, BGP):
        out: frozenset = frozenset()
        for p in node.patterns:
            out |= _var(p.s) | _var(p.p) | _var(p.o)
        return out
    if isinstance(node, Table):
        return frozenset(
            v for i, v in enumerate(node.variables)
            if any(row[i] is not None for row in node.rows))
    if isinstance(node, (Join, Union, LeftJoin)):
        return may_bind_vars(node.lhs) | may_bind_vars(node.rhs)
    if isinstance(node, (Minus, SemiJoin)):
        return may_bind_vars(node.lhs)  # rhs never contributes bindings
    if isinstance(node, (Filter, Distinct, Reduced, Slice, Order)):
        return may_bind_vars(node.child)
    if isinstance(node, NamedGraph):
        return may_bind_vars(node.child) | _var(node.graph)
    if isinstance(node, Extend):
        return may_bind_vars(node.child) | {node.name}
    if isinstance(node, Project):
        return may_bind_vars(node.child) & frozenset(node.variables)
    if isinstance(node, PathPattern):
        out = _var(node.subject) | _var(node.object)
        if node.graph is not None:
            out |= _var(node.graph)
        return out
    if isinstance(node, Aggregate):
        return frozenset(node.group_names) | {v for v, _ in node.aggs}
    if isinstance(node, Window):
        return may_bind_vars(node.child) | {v for v, _ in node.functions}
    if isinstance(node, Service):
        return may_bind_vars(node.child)
    if isinstance(node, Subquery):
        q = node.query
        if q.variables:
            return frozenset(q.variables)
        return may_bind_vars(q.algebra)
    return frozenset()  # JoinIdentity / UnionIdentity / unknown leaves


from kineo_spark.expr import Expr  # noqa: E402  (circular-safe: types only)
