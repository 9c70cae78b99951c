"""Query explanation: algebra serialization + Spark physical plans.

Analog of the reference's ``kineo explain`` subcommand
(/root/reference/Sources/kineo-cli/main.swift:275-333), which prints the
parsed query (``q.serialize()``) followed by the serialized physical
query plan (``plan.serialize(depth:)``, SPARQL/QueryPlan.swift:147-247).

Here the "physical plan" is Catalyst's: after lowering the algebra to a
DataFrame we ask Spark for its formatted plan, which is the plan that
actually runs (with AQE re-planning at runtime). The algebra sections
show the two IRs we own — parsed and rewritten — so a user can see the
custom pre-passes (path expansion, filter/constant folds) separately
from what Catalyst does.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from kineo_spark import algebra as A
from kineo_spark.model import PyTerm

# ---------------------------------------------------------------------------
# Algebra serialization (reference: Query.serialize / Algebra.serialize)
# ---------------------------------------------------------------------------

_INDENT = "  "


def _compact(v: Any) -> str:
    """One-line rendering for pattern/expression-ish values."""
    if isinstance(v, A.Var):
        return f"?{v.name}" if v.binding else f"?[{v.name}]"
    if isinstance(v, PyTerm):
        return v.n3()
    if isinstance(v, A.QuadPattern):
        return " ".join(_compact(n) for _, n in v.nodes())
    if isinstance(v, A.TriplePattern):
        return " ".join(_compact(n) for n in (v.s, v.p, v.o))
    if isinstance(v, str):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_compact(x) for x in v) + "]"
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        fields = [
            f"{f.name}={_compact(getattr(v, f.name))}"
            for f in dataclasses.fields(v)
            if getattr(v, f.name) != f.default
        ]
        name = type(v).__name__
        return f"{name}({', '.join(fields)})" if fields else name
    return repr(v)


def _is_tree(v: Any) -> bool:
    return isinstance(v, (A.Algebra, A.SelectQuery, A.AskQuery,
                          A.ConstructQuery, A.DescribeQuery))


def serialize_algebra(node: Any, depth: int = 0) -> str:
    """Indented tree rendering of an algebra (or query-form) node,
    shaped like the reference's ``QueryPlan.serialize(depth:)``."""
    pad = _INDENT * depth
    if not dataclasses.is_dataclass(node) or isinstance(node, type):
        return f"{pad}{_compact(node)}\n"

    scalars: list[str] = []
    children: list[Any] = []
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if _is_tree(v):
            children.append(v)
        elif isinstance(v, (list, tuple)) and any(_is_tree(x) for x in v):
            children.extend(x for x in v if _is_tree(x))
            rest = [x for x in v if not _is_tree(x)]
            if rest:
                scalars.append(f"{f.name}={_compact(rest)}")
        elif v != f.default:
            scalars.append(f"{f.name}={_compact(v)}")

    head = type(node).__name__
    if scalars:
        head += "(" + ", ".join(scalars) + ")"
    out = f"{pad}{head}\n"
    for c in children:
        out += serialize_algebra(c, depth + 1)
    return out


def serialize_query(q: Any) -> str:
    return serialize_algebra(q)


# ---------------------------------------------------------------------------
# Spark plan capture
# ---------------------------------------------------------------------------


def spark_plan_string(df, mode: str = "formatted") -> str:
    """Catalyst's explain output as a string (what ``df.explain(mode)``
    prints). Modes: simple | extended | codegen | cost | formatted."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def explain(engine, sparql: str, mode: str = "formatted") -> str:
    """Full explanation: parsed algebra, rewritten algebra, Spark plan.

    ``engine`` is a kineo_spark.engine.Engine. The Spark section compiles
    the query but does not execute it (plans only), matching the
    reference Explain subcommand's behavior of planning without
    evaluating (kineo-cli/main.swift:312-331).
    """
    from kineo_spark import forms
    from kineo_spark.rewrite import rewrite
    from kineo_spark.sparql_parser import parse_query

    q = parse_query(sparql)
    out = ["Parsed query:", serialize_query(q).rstrip()]

    if getattr(q, "dataset", ()):
        # plan against the FROM/FROM NAMED-scoped store, like query()
        from kineo_spark.engine import Engine
        from kineo_spark.store import DatasetGraphStore

        defaults, named = q.dataset
        engine = Engine(DatasetGraphStore(engine.store, defaults, named))

    rewritten = rewrite(q.algebra)
    out += ["", "Rewritten algebra:", serialize_algebra(rewritten).rstrip()]

    # plans-only contract: compiling for explain must not run Spark jobs
    # or network I/O (SERVICE placeholders, no bind-join probe)
    prev_plans_only = engine.compiler.plans_only
    engine.compiler.plans_only = True
    try:
        if isinstance(q, A.SelectQuery):
            df = forms.select(engine.compiler,
                              A.SelectQuery(rewritten, q.variables))
        elif isinstance(q, A.AskQuery):
            forms._prepare(engine.compiler, q)
            df = engine.compiler.compile(rewritten).df.limit(1)
        elif isinstance(q, A.ConstructQuery):
            df = forms.construct(engine.compiler,
                                 A.ConstructQuery(rewritten, q.template))
        elif isinstance(q, A.DescribeQuery):
            df = forms.describe(engine.compiler, q)
        else:  # pragma: no cover - parser only produces the four forms
            raise ValueError(f"unsupported query form {type(q).__name__}")
    finally:
        engine.compiler.plans_only = prev_plans_only

    out += ["", f"Spark plan [{mode}]:", spark_plan_string(df, mode).rstrip()]
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# Analyzed (executed) plan with per-operator runtime metrics
# ---------------------------------------------------------------------------


def _scala_map_items(m):
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def _seq_items(s):
    it = s.iterator()
    while it.hasNext():
        yield it.next()


def analyzed_plan_string(df) -> str:
    """Execute the DataFrame and render the FINAL physical plan (post-AQE)
    annotated with each operator's runtime SQL metrics — rows produced and
    any time metrics. The analog of the reference's per-operator wall-time
    tree (``QueryPlan`` evaluation metrics, SPARQL/QueryPlan.swift:11-111),
    sourced from the same counters the Spark UI shows."""
    import time as _time

    t0 = _time.time()
    n = len(df.collect())  # runs THIS DataFrame's QueryExecution, so the
    wall = _time.time() - t0  # plan objects below carry its live metrics
    lines = [f"== Analyzed plan ==  ({n} rows, {wall:.3f}s wall)"]
    lines += analyzed_operator_lines(df)
    return "\n".join(lines) + "\n"


def analyzed_operator_lines(df) -> list[str]:
    """Per-operator metric lines for an ALREADY-EXECUTED DataFrame's
    final (post-AQE) physical plan — one indented line per operator with
    rows produced and time metrics. Shared by ``explain --analyze`` and
    bench.py's per-operator extras."""
    plan = df._jdf.queryExecution().executedPlan()
    lines: list[str] = []

    def walk(node, depth):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # descend into the final re-planned tree
            try:
                walk(node.executedPlan(), depth)
                return
            except Exception:
                pass
        parts = []
        try:
            for key, metric in _scala_map_items(node.metrics()):
                try:
                    v = metric.value()
                except Exception:
                    continue
                if key == "numOutputRows":
                    parts.insert(0, f"rows={v}")
                elif "time" in key.lower() or "Time" in key:
                    try:
                        mtype = metric.metricType()
                    except Exception:
                        mtype = "timing"
                    ms = v // 1_000_000 if mtype == "nsTiming" else v
                    parts.append(f"{key}={ms}ms")
        except Exception:
            pass
        suffix = f"  [{', '.join(parts)}]" if parts else ""
        lines.append(f"{_INDENT * depth}{name}{suffix}")
        for child in _seq_items(node.children()):
            walk(child, depth + 1)
        # shuffle/broadcast reuse boundaries keep their child under a
        # query-stage wrapper rather than children()
        if name.endswith("QueryStage"):
            try:
                walk(node.plan(), depth + 1)
            except Exception:
                pass

    walk(plan, 1)
    return lines


def explain_analyze(engine, sparql: str) -> str:
    """``kineo explain --analyze``: the static explanation plus the
    executed plan with per-operator row counts and times."""
    from kineo_spark.engine import QueryResult

    static = explain(engine, sparql, "simple")
    result: QueryResult = engine.query(sparql)
    df = result.bindings if result.bindings is not None else result.triples
    if df is None:  # ASK
        return static + f"\nASK result: {result.boolean}\n"
    return static + "\n" + analyzed_plan_string(df)
