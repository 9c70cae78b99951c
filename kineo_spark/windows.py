"""Window function lowering (SURVEY §2.5).

Reference: ``WindowPlan`` with pre-sorted input and peer-group splitting
(/root/reference/Sources/Kineo/SPARQL/MaterializedQueryPlan.swift:776-1558).
Spark's native window exec replaces the hand-rolled sliding accumulators;
frames are ROWS-only like the reference (RANGE throws unimplemented at
MaterializedQueryPlan.swift:849-852).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from kineo_spark import algebra as A
from kineo_spark.expr import compile_expr, is_numeric_term, num_term
from kineo_spark.model import sort_key, term_key


def _frame(spec: A.WindowSpec) -> tuple[int, int]:
    lo = W.unboundedPreceding if spec.frame_start is None else spec.frame_start
    hi = W.unboundedFollowing if spec.frame_end is None else spec.frame_end
    return lo, hi


def compile_window(node: A.Window, child, graph_var: str | None = None,
                   graph_key=None) -> "Plan":
    """``graph_var``/``graph_key`` set = the window sits under
    ``GRAPH ?var`` (§18.1.7): every PARTITION BY implicitly includes the
    active graph, so ranks/frames never span graphs — the distributed
    form of the reference's per-graph evaluation (QueryPlanner.swift:
    834-878)."""
    from kineo_spark.compiler import Plan, _env

    df = child.df
    env = _env(df)
    out = df
    for var, spec in node.functions:
        parts = [term_key(compile_expr(e, env)) for e in spec.partition]
        if graph_key is not None:
            parts = [graph_key] + parts
        orders = []
        for cmp in spec.order:
            k = sort_key(compile_expr(cmp.expr, env))
            orders.append(k.asc() if cmp.ascending else k.desc())
        w = W.partitionBy(*parts) if parts else W.partitionBy(F.lit(0))
        if orders:
            w = w.orderBy(*orders)

        op = spec.op
        if op in ("RANK", "DENSE_RANK", "ROW_NUMBER"):
            fn = {"RANK": F.rank, "DENSE_RANK": F.dense_rank, "ROW_NUMBER": F.row_number}[op]
            col = num_term(fn().over(w).cast("double"), F.lit("integer"))
        elif op == "NTILE":
            col = num_term(F.ntile(spec.n or 1).over(w).cast("double"), F.lit("integer"))
        else:
            # COUNT* has no operand (r10 fuzz find: compiling the None
            # expr crashed every COUNT(*) OVER (...) — the branch below
            # never reads `value` for it)
            value = (compile_expr(spec.expr, env)
                     if spec.expr is not None else None)
            lo, hi = _frame(spec)
            if spec.frame_type == "RANGE":
                # RANGE frames peer-group on the ORDER BY VALUE — Spark
                # rangeBetween needs a single numeric sort key, so order
                # by the term's numeric shadow directly (an extension:
                # the reference throws on RANGE frames,
                # MaterializedQueryPlan.swift:849-852)
                if len(spec.order) != 1:
                    raise ValueError("RANGE frame requires exactly one ORDER BY key")
                cmp = spec.order[0]
                okey = compile_expr(cmp.expr, env)["num"]
                wr = (W.partitionBy(*parts) if parts else W.partitionBy(F.lit(0)))
                wr = wr.orderBy(okey.asc() if cmp.ascending else okey.desc())
                wf = wr.rangeBetween(lo, hi)
            else:
                wf = w.rowsBetween(lo, hi)
            if op == "COUNT*":
                agg = F.count(F.lit(1)).over(wf).cast("double")
                col = num_term(agg, F.lit("integer"))
            elif op == "COUNT":
                col = num_term(F.count(value).over(wf).cast("double"), F.lit("integer"))
            elif op in ("SUM", "AVG", "MIN", "MAX"):
                num = F.when(is_numeric_term(value), value["num"])
                if spec.exact and op in ("SUM", "AVG"):
                    dec = num.cast("decimal(25,6)")
                    if op == "SUM":
                        agg = F.sum(dec).over(wf).cast("double")
                    else:
                        agg = F.sum(dec).over(wf).cast("double") / F.count(num).over(wf)
                else:
                    fn = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[op]
                    agg = fn(num).over(wf).cast("double")
                col = num_term(agg, F.lit("double"))
            elif op == "SAMPLE":
                col = F.first(value, ignorenulls=True).over(wf)
            elif op == "GROUP_CONCAT":
                from kineo_spark.expr import str_term
                coll = F.collect_list(value["lex"]).over(wf)
                col = str_term(F.concat_ws(spec.separator or " ", coll))
            elif op in _CUSTOM_WINDOWS:
                col = _CUSTOM_WINDOWS[op](spec, value, wf)
            else:
                raise ValueError(f"unknown window function {op}")
        out = out.withColumn(var, col)
    return Plan(out, child.certain, child.id_vars)


# ---------------------------------------------------------------------------
# Custom window functions — EXTENSION past the reference, which throws
# "unimplemented" on custom windows (MaterializedQueryPlan.swift:942-943).
# Registry mirrors the extension-function-by-IRI registry in expr.py: a
# registered callable gets (spec, value term column, frame window) and
# returns a term-struct Column. Registered functions can be pure Column
# expressions (JVM, whole-stage codegen) or Arrow-batched pandas
# GROUPED_AGG UDFs applied .over(window) — both compose with the same
# partition/order/frame machinery above.
# ---------------------------------------------------------------------------

_CUSTOM_WINDOWS: dict = {}


def register_window_function(name: str, fn) -> None:
    """Register ``fn(spec, value, frame_window) -> Column`` under a name
    (use an IRI for namespacing, as with expr extension functions)."""
    _CUSTOM_WINDOWS[name] = fn


def _w_geometric_mean(spec: A.WindowSpec, value, wf):
    num = F.when(is_numeric_term(value), value["num"])
    g = F.exp(F.avg(F.ln(num)).over(wf))
    return num_term(g.cast("double"), F.lit("double"))


def _w_median(spec: A.WindowSpec, value, wf):
    num = F.when(is_numeric_term(value), value["num"])
    return num_term(F.median(num).over(wf).cast("double"), F.lit("double"))


register_window_function("GEOMETRIC_MEAN", _w_geometric_mean)
register_window_function("MEDIAN", _w_median)
