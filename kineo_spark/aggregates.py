"""Aggregation lowering (SURVEY §2.4).

Reference: ``AggregationPlan`` hash aggregation with one accumulator per
(group, agg) and emit-on-empty for ungrouped aggregates
(/root/reference/Sources/Kineo/SPARQL/MaterializedQueryPlan.swift:2183-2559).
Spark gives us partial (map-side) + final aggregation, spill, and AQE for
free — the reference has a single in-memory hash table.

Design notes for scale & determinism:
- group keys are canonical term-key strings (flat shuffle keys);
  representative group terms ride as EXTRA GROUP KEYS (functionally
  dependent on the term key) rather than via ``first()`` — a first()
  over a struct/string has a non-mutable UnsafeRow buffer, which forces
  SortAggregate (two full sorts around the exchange) where a
  HashAggregate should run (r12, guide §2.4).
- ``AggSpec.exact=True`` routes SUM/AVG through DECIMAL(25,6)
  accumulation: decimal addition is associative, so results are
  independent of partitioning/merge order — required for hash-equality
  against a single-threaded oracle and generally the right call on a
  1000-executor cluster.
- GROUP_CONCAT sorts collected values before joining: SPARQL leaves the
  order implementation-defined, and a deterministic order is the only
  scale-sane choice (matches the DuckDB oracle's ORDER BY form).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from kineo_spark import algebra as A
from kineo_spark.expr import compile_expr, is_numeric_term, num_term, str_term
from kineo_spark.model import sort_key, term_key

_DEC = "decimal(25,6)"


def _agg_column(spec: A.AggSpec, value: Column | None) -> Column:
    op = spec.op
    if op == "COUNT*":
        return num_term(F.count(F.lit(1)).cast("double"), F.lit("integer"))
    assert value is not None
    if op == "COUNT":
        if spec.distinct:
            return num_term(F.count_distinct(term_key(value)).cast("double"), F.lit("integer"))
        return num_term(F.count(value).cast("double"), F.lit("integer"))
    if op in ("SUM", "AVG"):
        num = F.when(is_numeric_term(value), value["num"])
        acc_t = _DEC if spec.exact else "double"
        if spec.distinct:
            # DISTINCT applies to the list of evaluation RESULTS — RDF
            # TERMS, not numeric values (§18.5.1 Aggregation: Distinct
            # over ListEval): {"3"^^xsd:integer, "3.0"^^xsd:decimal}
            # are two distinct terms and SUM(DISTINCT) = 6.0, even
            # though both have value 3 (r12 fuzz-family find — the old
            # sum_distinct(num) deduped by VALUE and returned 3).
            # collect_set over (term key, accumulator) dedups exactly
            # like COUNT(DISTINCT) below; the set is O(distinct terms)
            # per group — the same state any distinct agg keeps.
            pair = F.when(is_numeric_term(value), F.struct(
                term_key(value).alias("k"), num.cast(acc_t).alias("v")))
            pairs = F.collect_set(pair)
            total = F.aggregate(
                pairs, F.lit(0).cast(acc_t),
                lambda a, x: (a + x["v"]).cast(acc_t)).cast("double")
            cnt = F.size(pairs).cast("long")
        elif spec.exact:
            total = F.sum(num.cast(_DEC)).cast("double")
            cnt = F.count(num)
        else:
            total, cnt = F.sum(num), F.count(num)
        # SPARQL semantics (and the reference evaluator,
        # MaterializedQueryPlan.swift:2183-2559): Sum/Avg of the EMPTY
        # multiset is 0 (an xsd:integer); a group containing any
        # non-numeric / unbound / error value makes the aggregate an
        # error → unbound. Both flags are plain extra accumulators, so
        # partial+final aggregation shape is unchanged.
        n_rows = F.count(F.lit(1))
        has_err = F.max(F.when(is_numeric_term(value), F.lit(0)).otherwise(F.lit(1)))
        # numeric promotion (op:numeric-add chain): SUM over all-integer
        # inputs is an xsd:integer; any wider input widens the result.
        # AVG of integers is decimal per the spec, so SUM only. The flag
        # is one more cheap accumulator; error rows don't matter (the
        # result is already unbound then).
        # widest operand type on the promotion lattice integer(0) <
        # decimal(1) < float(2) < double(3): the op:numeric-add chain
        # promotes pairwise, so the result type is the max over inputs
        # (§18.5; Expression.swift resultType(for:withOperandType:)).
        # One cheap max accumulator; error rows don't matter (the
        # result is already unbound then).
        widest = F.max(
            F.when(~is_numeric_term(value), F.lit(0))
            .when(value["dt"] == "double", F.lit(3))
            .when(value["dt"] == "float", F.lit(2))
            .when(value["dt"].isin("integer", "int", "long"), F.lit(0))
            .otherwise(F.lit(1))
        )
        raw = total if op == "SUM" else total / cnt
        val = (
            F.when(n_rows == 0, F.lit(0.0))
            .when(has_err == 1, F.lit(None).cast("double"))
            .otherwise(raw.cast("double"))
        )
        dt = F.when(n_rows == 0, F.lit("integer"))
        if op == "SUM":
            dt = dt.when(widest == 0, F.lit("integer"))
        else:  # AVG of integers is decimal per the spec
            dt = dt.when(widest == 0, F.lit("decimal"))
        dt = (dt.when(widest == 3, F.lit("double"))
                .when(widest == 2, F.lit("float"))
                .otherwise(F.lit("decimal")))
        return num_term(val, dt)
    if op in ("MIN", "MAX"):
        # error rows (unbound operand) are SKIPPED, not compared: the
        # reference accumulators `try?`-skip them (MinimumAggregate,
        # MaterializedQueryPlan.swift:2197-2242). min_by/max_by skip
        # rows whose ORDERING value is null — but sort_key over a NULL
        # term struct is a non-null struct of nulls that sorts SMALLEST,
        # so MIN over {unbound, "a"} returned unbound (r12 fuzz find,
        # compat term-mode seed 1). Null the ordering out explicitly;
        # an all-error group then yields null → unbound, as specified.
        fn = F.min_by if op == "MIN" else F.max_by
        return fn(value, F.when(value.isNotNull(), sort_key(value)))
    if op == "SAMPLE":
        return F.first(value, ignorenulls=True)
    if op == "GROUP_CONCAT":
        lex = value["lex"]
        if spec.distinct:
            # DISTINCT is over TERMS (§18.5.1.7): the same lexical form
            # under different datatypes/languages contributes once per
            # term, not once per lexical form — dedup on the full term
            # key, emit lexical forms in deterministic (lex, key) order
            pairs = F.array_sort(F.collect_set(
                F.struct(lex.alias("x"), term_key(value).alias("k"))))
            coll = F.transform(pairs, lambda s: s["x"])
        else:
            coll = F.array_sort(F.collect_list(lex))
        return str_term(F.concat_ws(spec.separator, coll))
    if op == "APPROX_QUANTILE":
        # extension (no reference analog): t-digest-style sketch via
        # percentile_approx — mergeable partial state, the scalable
        # answer to median/p99 over 100 TB where exact percentile needs
        # a full sort
        num = F.when(is_numeric_term(value), value["num"])
        return num_term(
            F.percentile_approx(num, spec.quantile, 10_000).cast("double"),
            F.lit("double"),
        )
    if op == "APPROX_COUNT_DISTINCT":
        # extension beyond the reference (SURVEY §2.4 notes its absence):
        # HyperLogLog++ sketch — the 100 TB answer to COUNT(DISTINCT)
        return num_term(
            F.approx_count_distinct(term_key(value)).cast("double"), F.lit("integer")
        )
    raise ValueError(f"unknown aggregate {op}")


def compile_aggregate(compiler, node: A.Aggregate, child,
                      graph_var: str | None = None) -> "Plan":
    """``graph_var`` set = the aggregate sits under ``GRAPH ?var``
    (§18.1.7): the whole subtree evaluates once per named graph, so the
    graph column joins the GROUP BY keys implicitly — the distributed
    form of the reference's per-graph union (QueryPlanner.swift:
    834-878): one shuffle keyed by (graph, group keys), not a driver
    loop over graphs. An UNGROUPED aggregate additionally emits its
    empty-bag row (COUNT=0, SUM=0, MIN/MAX/AVG unbound) for every named
    graph the child produced NO rows for — exactly what evaluating the
    scalar aggregate per graph yields."""
    from kineo_spark.compiler import Plan, _env, _tmp
    from kineo_spark.scale import spread_small_scan

    # unsplittable-input remedy (guide §2.5): a narrow scan→filter→
    # project child arrives as ONE partition when the table is a single
    # parquet row group, which serializes the whole partial aggregation
    # (term-key construction, decimal casts, hash update) on one core —
    # measured on sparql_agg_q1 at sf0.1: the 600k-row scan+partial-agg
    # stage ran as 1 task end to end. Round-robin only when below
    # cluster parallelism; at real scale the check is a no-op. Results
    # are unchanged: partial aggregation is order-insensitive here
    # (decimal accumulation is associative; MIN/MAX pick by total term
    # order; deterministic round-robin keeps reruns stable) — verified
    # against the oracle sweep.
    df = spread_small_scan(child.df)
    env = _env(df)

    group_terms = {name: compile_expr(e, env) for name, e in zip(node.group_names, node.groups)}
    key_cols = {name: _tmp(f"gk_{name}") for name in group_terms}
    gkey = None
    if graph_var is not None:
        gkey = _tmp("gk_graph")
        key_cols = {**key_cols, graph_var: gkey}
        group_terms = {**group_terms, graph_var: df[graph_var]}

    work = df.select(
        *[c for c in df.columns if not c.startswith("__")],
        *[(t if n == graph_var and n in child.id_vars
           else term_key(t)).alias(key_cols[n])
          for n, t in group_terms.items()],
        *[t.alias(f"__gt_{n}") for n, t in group_terms.items()],
    )

    # The representative group term is FUNCTIONALLY DEPENDENT on its
    # term-key string (term_key is injective over kind/lex/dt/lang and
    # num is derived from lex), so it joins the GROUP BY keys instead of
    # riding in a first() aggregate: a first() whose buffer is a struct
    # or string is not UnsafeRow-mutable, which forces SortAggregate —
    # two extra full sorts of the stream around the exchange (guide
    # §2.4; measured on sparql_agg_q1: SortAggregate×2 + Sort×2 →
    # HashAggregate×2, no Sort). Same bytes through the exchange (the
    # struct travels as key instead of as partial-first state).
    group_key_sel = [F.col(f"__gt_{name}").alias(name)
                     for name in group_terms]
    value_aggs = []
    for var, spec in node.aggs:
        value = compile_expr(spec.expr, {v: work[v] for v in df.columns if not v.startswith("__")}) if spec.expr is not None else None
        value_aggs.append(_agg_column(spec, value).alias(var))

    out_vars = ([n for n in group_terms if n != graph_var]
                + ([graph_var] if graph_var else [])
                + [var for var, _ in node.aggs])
    explicit_groups = len(node.group_names) > 0
    if explicit_groups:
        out = work.groupBy(*[F.col(k) for k in key_cols.values()],
                           *group_key_sel).agg(*value_aggs)
        out = out.select(*out_vars)
    elif graph_var is not None:
        # ungrouped aggregate under GRAPH ?var: group by the graph
        # alone, then fill the empty-bag row (the engine's own global
        # agg over zero rows — COUNT=0/SUM=0, MIN/MAX/AVG unbound) for
        # every named graph the child produced no rows for: per-graph
        # evaluation of a scalar aggregate emits one row PER NAMED
        # GRAPH (§18.5 over the empty multiset). The fill joins the
        # memoized graph_terms — broadcast-sized.
        out = work.groupBy(F.col(gkey), *group_key_sel) \
            .agg(*value_aggs).select(*out_vars)
        empty = work.limit(0).agg(*value_aggs)
        gt = (compiler.store.graph_terms()
              .withColumnRenamed("__g", graph_var))
        if graph_var in child.id_vars:
            # id mode: the graph column rides as a dictionary id (the
            # query never reads ?g's VALUE), so encode names(D) through
            # the same hash the scans use (id_of_term_col at the
            # compiler's key width) and anti-join in pure id space —
            # the fill rows then carry the id form every downstream
            # consumer expects. (128-bit struct ids compare/union
            # field-wise. 64-bit collision-repaired ids CANNOT reach
            # this anti-join: the id_compiler stack is raw-hash-only by
            # invariant — repaired layouts exist solely behind the
            # remap-carrying scan_ids/persist_id_layout workflow, see
            # encode_quads_repaired's INVARIANT note in dictionary.py —
            # so the freshly hashed graph terms and the plan's ids are
            # always the same currency.)
            from kineo_spark.dictionary import id_of_term_col
            key_bits = getattr(compiler, "_key_bits", 64)
            gt = gt.select(
                id_of_term_col(F.col(graph_var), key_bits).alias(graph_var))
            have = out.select(F.col(graph_var).alias("__k"))
            absent = gt.join(have, gt[graph_var] == have["__k"],
                             "left_anti")
        else:
            have = out.select(term_key(F.col(graph_var)).alias("__k"))
            absent = gt.join(have,
                             term_key(gt[graph_var]) == have["__k"],
                             "left_anti")
        out = out.unionByName(absent.crossJoin(F.broadcast(empty)))
    else:
        # no GROUP BY: single global group; Spark's global agg emits one
        # row on empty input — matching emitOnEmpty
        # (MaterializedQueryPlan.swift:2461,2525-2537)
        out = work.agg(*value_aggs)
        out = out.select(*[var for var, _ in node.aggs])
    # a group var is certainly bound when its expression is a bare
    # variable that was certainly bound in the child (lets downstream
    # joins stay strict equi-joins)
    from kineo_spark.expr import EVar

    certain = frozenset(
        name
        for name, e in zip(node.group_names, node.groups)
        if isinstance(e, EVar) and e.name in child.certain
    )
    if graph_var is not None and graph_var in child.certain:
        certain |= {graph_var}
    ids = (frozenset({graph_var})
           if graph_var is not None and graph_var in child.id_vars
           else frozenset())
    return Plan(out, certain, ids)
