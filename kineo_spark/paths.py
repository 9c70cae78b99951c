"""Property path evaluation (SURVEY §2.8).

Reference: recursive path iterators with an ``alp`` transitive-closure
helper (/root/reference/Sources/Kineo/SPARQL/MaterializedQueryPlan.swift:
1707-2174 and IDQueryPlan.swift:802-1225). The SQLite backend compiles
``p+``/``p*`` to recursive CTEs (SQLiteQuadStore.swift:593-665); Spark SQL
has no recursive CTE, so the transitive operators run as a driver-
coordinated distributed semi-naive fixpoint:

    frontier ⋈ edges → new pairs; accumulate DISTINCT; stop when empty.

Each round is a full Spark job (hash join + dedup, all executors);
``localCheckpoint`` truncates lineage so 100-round closures don't build
mile-long plans. The edge relation is deduplicated once up front —
closure size, not input size, bounds the work. For analytic-scale
all-pairs reachability GraphFrames/Pregel is the alternative backend;
this implementation keeps everything in DataFrame land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark import algebra as A
from kineo_spark.model import PyTerm, term_key

# pair frame columns: __s term, __o term, __sk, __ok (keys)


def _pairs(df: DataFrame, s, o) -> DataFrame:
    return df.select(
        s.alias("__s"), o.alias("__o"),
        term_key(s).alias("__sk"), term_key(o).alias("__ok"),
    )


def _edges_for(compiler, path: A.Path, graph) -> DataFrame:
    """One-step relation for a path as (__s, __o, __sk, __ok)."""
    A_ = A
    if isinstance(path, A.PLink):
        sv, ov = A.Var("__ps"), A.Var("__po")
        plan = compiler._scan(A.QuadPattern(sv, path.iri, ov, graph))
        return _pairs(plan.df, plan.df["__ps"], plan.df["__po"])
    if isinstance(path, A.PInv):
        inner = _edges_for(compiler, path.path, graph)
        return inner.select(
            inner["__o"].alias("__s"), inner["__s"].alias("__o"),
            inner["__ok"].alias("__sk"), inner["__sk"].alias("__ok"),
        )
    if isinstance(path, A.PSeq):
        l = _edges_for(compiler, path.lhs, graph)
        r = _edges_for(compiler, path.rhs, graph)
        r2 = r.select(
            r["__s"].alias("__ms"), r["__o"].alias("__ro"),
            r["__sk"].alias("__msk"), r["__ok"].alias("__rok"),
        )
        j = l.join(r2, l["__ok"] == r2["__msk"], "inner")
        return j.select(
            j["__s"], j["__ro"].alias("__o"), j["__sk"], j["__rok"].alias("__ok")
        )
    if isinstance(path, A.PAlt):
        return _edges_for(compiler, path.lhs, graph).unionByName(
            _edges_for(compiler, path.rhs, graph)
        )
    if isinstance(path, A.PNps):
        sv, pv, ov = A.Var("__ps"), A.Var("__pp"), A.Var("__po")
        plan = compiler._scan(A.QuadPattern(sv, pv, ov, graph))
        df = plan.df
        excluded = [t.lex for t in path.iris]
        df = df.filter(~df["__pp"]["lex"].isin(excluded))
        return _pairs(df, df["__ps"], df["__po"])
    if isinstance(path, (A.PPlus, A.PStar, A.PZeroOrOne)):
        raise ValueError("nested closure paths must go through eval_path")
    raise NotImplementedError(type(path).__name__)


def _closure(compiler, edges: DataFrame, max_iterations: int,
             seed_key: str | None = None, reverse: bool = False,
             strategy: str = "seminaive") -> DataFrame:
    """Semi-naive transitive closure, iterated in KEY SPACE.

    The fixpoint loop moves only (a, b) pairs of 8-byte ``xxhash64``
    node keys — 16 B/row through every iteration's shuffle, the same id
    convention (hash of the injective term key) the dictionary layout
    uses — and term structs are joined back ONCE from the node map after
    convergence. At 100 TB this is the difference between shuffling
    closure-sized streams of lexical structs every round and shuffling
    longs.

    With ``seed_key`` (a bound endpoint), the loop is a seeded BFS over
    the edge relation (reverse=True walks edges backwards for a bound
    OBJECT): only the reachable set is computed, not the full closure —
    the reference's ``alp`` procedure does exactly this
    (MaterializedQueryPlan.swift:2101-2174)."""
    ek = edges.select(
        F.xxhash64("__sk").alias("__a"), F.xxhash64("__ok").alias("__b")
    ).dropDuplicates(["__a", "__b"])
    nodes = (
        edges.select(F.xxhash64("__sk").alias("__k"),
                     F.col("__s").alias("__n"), F.col("__sk").alias("__nk"))
        .unionByName(
            edges.select(F.xxhash64("__ok").alias("__k"),
                         F.col("__o").alias("__n"), F.col("__ok").alias("__nk")))
        .dropDuplicates(["__k"])
    )
    if reverse:
        ek = ek.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    ek = ek.localCheckpoint(eager=True)
    if seed_key is None and strategy == "doubling":
        # Path-doubling (recursive squaring): R_{k+1} = R_k ∪ R_k∘R_k
        # covers every path length ≤ 2^(k+1), so a diameter-d graph
        # converges in ⌈log2 d⌉ rounds instead of d. Each round joins
        # the closure-so-far with itself — more work per round than the
        # semi-naive frontier⋈edges step, but on high-diameter graphs
        # (chains, DAG lineages: d in the hundreds) round count is the
        # bottleneck at cluster scale: every round is a full shuffle
        # stage + driver sync. Same key-space currency (16 B/row).
        acc = ek
        for _ in range(max_iterations):
            r2 = acc.select(F.col("__a").alias("__ja"), F.col("__b").alias("__jb"))
            grown = (
                acc.join(r2, acc["__b"] == r2["__ja"], "inner")
                .select(acc["__a"], F.col("__jb").alias("__b"))
                .dropDuplicates(["__a", "__b"])
            )
            new = grown.join(acc, ["__a", "__b"], "left_anti").localCheckpoint(eager=True)
            if new.isEmpty():
                break
            acc = acc.unionByName(new).localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                f"path closure did not converge in {max_iterations} iterations")
    else:
        if seed_key is not None:
            frontier = ek.filter(F.col("__a") == F.xxhash64(F.lit(seed_key)))
        else:
            frontier = ek
        acc = frontier.localCheckpoint(eager=True)
        frontier = acc
        e2 = ek.select(F.col("__a").alias("__ea"), F.col("__b").alias("__eb"))
        for _ in range(max_iterations):
            grown = (
                frontier.join(e2, frontier["__b"] == e2["__ea"], "inner")
                .select(frontier["__a"], F.col("__eb").alias("__b"))
                .dropDuplicates(["__a", "__b"])
            )
            new = grown.join(acc, ["__a", "__b"], "left_anti").localCheckpoint(eager=True)
            if new.isEmpty():
                break
            acc = acc.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        else:
            raise RuntimeError(
                f"path closure did not converge in {max_iterations} iterations")
    if reverse:
        acc = acc.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    na = nodes.select(F.col("__k").alias("__ka"), F.col("__n").alias("__s"),
                      F.col("__nk").alias("__sk"))
    nb = nodes.select(F.col("__k").alias("__kb"), F.col("__n").alias("__o"),
                      F.col("__nk").alias("__ok"))
    out = (
        acc.join(na, acc["__a"] == na["__ka"], "inner")
        .join(nb, acc["__b"] == nb["__kb"], "inner")
    )
    return out.select("__s", "__o", "__sk", "__ok")


def _term_pair(compiler, t: PyTerm) -> DataFrame:
    """Single zero-length pair (t, t) — the whole zero-length
    contribution when an endpoint is bound: ALP starts from the bound
    term itself, whether or not it appears in the graph (reference
    MaterializedQueryPlan.swift:2101-2174), so scanning every graph
    node just to keep one is both wasteful and subtly wrong for terms
    outside the graph."""
    from kineo_spark.model import TERM_SCHEMA
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("__s", TERM_SCHEMA),
                           T.StructField("__o", TERM_SCHEMA)])
    tup = (t.kind, t.lex, t.dt, t.lang, t.num)
    df = compiler.spark.createDataFrame([(tup, tup)], schema)
    return _pairs(df, df["__s"], df["__o"])


def _graph_nodes(compiler, graph) -> DataFrame:
    """All terms appearing as subject or object (zero-length path
    endpoints, reference MaterializedQueryPlan.swift:1986-2174)."""
    sv, pv, ov = A.Var("__ps"), A.Var("__pp", binding=False), A.Var("__po")
    plan = compiler._scan(A.QuadPattern(sv, pv, ov, graph))
    df = plan.df
    subs = df.select(df["__ps"].alias("__n"))
    objs = df.select(df["__po"].alias("__n"))
    nodes = subs.unionByName(objs)
    nodes = nodes.withColumn("__nk", term_key(nodes["__n"])).dropDuplicates(["__nk"])
    return nodes.select(
        nodes["__n"].alias("__s"), nodes["__n"].alias("__o"),
        nodes["__nk"].alias("__sk"), nodes["__nk"].alias("__ok"),
    )


def eval_path(compiler, node: A.PathPattern, graph) -> "Plan":
    from kineo_spark.compiler import Plan

    path = node.path
    # bound endpoint → seed the closure BFS there instead of computing
    # the full closure and filtering after (alp-style, see _closure)
    seed_key, seed_rev = None, False
    if isinstance(node.subject, PyTerm):
        seed_key = node.subject.key()
    elif isinstance(node.object, PyTerm):
        seed_key, seed_rev = node.object.key(), True
    seed_term = node.subject if not seed_rev else node.object
    strategy = getattr(compiler, "path_strategy", "seminaive")
    if isinstance(path, A.PPlus):
        pairs = _closure(compiler, _edges_for(compiler, path.path, graph),
                         compiler.max_path_iterations, seed_key, seed_rev,
                         strategy)
    elif isinstance(path, A.PStar):
        plus = _closure(compiler, _edges_for(compiler, path.path, graph),
                        compiler.max_path_iterations, seed_key, seed_rev,
                        strategy)
        zero = (_term_pair(compiler, seed_term) if seed_key is not None
                else _graph_nodes(compiler, graph))
        pairs = plus.unionByName(zero).dropDuplicates(["__sk", "__ok"])
    elif isinstance(path, A.PZeroOrOne):
        one = _edges_for(compiler, path.path, graph).dropDuplicates(["__sk", "__ok"])
        zero = (_term_pair(compiler, seed_term) if seed_key is not None
                else _graph_nodes(compiler, graph))
        pairs = one.unionByName(zero).dropDuplicates(["__sk", "__ok"])
    else:
        pairs = _edges_for(compiler, path, graph)

    # bind endpoints
    df = pairs
    out_cols = {}
    certain = set()
    for endpoint, col, key in (
        (node.subject, "__s", "__sk"),
        (node.object, "__o", "__ok"),
    ):
        if isinstance(endpoint, PyTerm):
            df = df.filter(F.col(key) == endpoint.key())
        else:
            if endpoint.name in out_cols:  # same var both ends
                df = df.filter(F.col("__sk") == F.col("__ok"))
            elif endpoint.binding:
                out_cols[endpoint.name] = col
                certain.add(endpoint.name)
    df = df.select(*[F.col(c).alias(n) for n, c in out_cols.items()])
    return Plan(df, frozenset(certain))
