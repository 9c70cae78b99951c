"""Graph API + bulk graph analytics over a quadstore.

Navigational API (reference: QuadStore/Graph.swift:11-185 — ``Vertex``
with ``instancesOf``, ``incoming``/``outgoing``, ``listElements`` for
rdf:List chains, ``edges``, ``graphs``): each call is a DataFrame
expression over store scans, so "navigation" composes into one Catalyst
plan instead of the reference's per-step store probes.

Bulk analytics (north-star: "GraphX for SPARQL analytics"): GraphX has
no Python binding and GraphFrames needs an external jar, so the
analytics are implemented Pregel-style as DataFrame iteration with
``localCheckpoint`` lineage cuts — the same execution shape GraphFrames
lowers to, with no dependency. Provided: connected components
(hash-min), PageRank, degree stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark import algebra as A
from kineo_spark.model import PyTerm, term_key
from kineo_spark.store import RDF_TYPE, QuadStore

RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


class Graph:
    def __init__(self, store: QuadStore, graph: PyTerm | None = None):
        self.store = store
        self._g = graph if graph is not None else A.Var("__g", binding=False)

    def _scan(self, s, p, o) -> DataFrame:
        return self.store.scan(A.QuadPattern(s, p, o, self._g))

    # -- navigation (Graph.swift:11-185) ---------------------------------
    def instances_of(self, cls: PyTerm) -> DataFrame:
        """Subjects with rdf:type cls (Graph.swift instancesOf)."""
        from kineo_spark.model import iri
        return self._scan(A.Var("node"), iri(RDF_TYPE), cls)

    def outgoing(self, pred: PyTerm) -> DataFrame:
        """(node, value) pairs via pred."""
        return self._scan(A.Var("node"), pred, A.Var("value"))

    def incoming(self, pred: PyTerm) -> DataFrame:
        """(value, node): nodes reaching value via pred."""
        return self._scan(A.Var("node"), pred, A.Var("value")).select(
            F.col("value").alias("node"), F.col("node").alias("source")
        )

    def list_elements(self, head: PyTerm, max_len: int = 1000) -> list:
        """Walk an rdf:first/rdf:rest chain (Graph.swift:45-60).
        Driver-side by nature (lists are short, pointer-chasing)."""
        from kineo_spark.model import iri
        out, cur = [], head
        for _ in range(max_len):
            if cur.kind == 0 and cur.lex == RDF_NIL:
                break
            first = self._scan(cur, iri(RDF_FIRST), A.Var("v")).collect()
            if not first:
                break
            out.append(PyTerm(**first[0]["v"].asDict()))
            rest = self._scan(cur, iri(RDF_REST), A.Var("v")).collect()
            if not rest:
                break
            cur = PyTerm(**rest[0]["v"].asDict())
        return out

    def edges(self, pred: PyTerm | None = None) -> DataFrame:
        """(src, dst) IRI/blank pairs — object-valued edges only."""
        p = pred if pred is not None else A.Var("__p", binding=False)
        df = self._scan(A.Var("src"), p, A.Var("dst"))
        return df.filter(F.col("dst")["kind"] != 2)  # drop literal objects

    def graphs(self) -> DataFrame:
        pat = A.QuadPattern(
            A.Var("__s", binding=False), A.Var("__p", binding=False),
            A.Var("__o", binding=False), A.Var("g"),
        )
        df = self.store.scan(pat)
        return df.withColumn("__k", term_key(F.col("g"))).dropDuplicates(["__k"]).drop("__k")


# ---------------------------------------------------------------------------
# Bulk analytics (Pregel-style DataFrame iteration)
# ---------------------------------------------------------------------------

def _edge_keys(edges: DataFrame) -> DataFrame:
    return edges.select(
        term_key(F.col("src")).alias("src"), term_key(F.col("dst")).alias("dst")
    ).dropDuplicates(["src", "dst"])


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Undirected connected components over (src, dst) TERM edges.
    Returns (node, component) where component is the minimum term-key
    in the component. See connected_components_keyed for the algorithm."""
    return connected_components_keyed(_edge_keys(edges), max_iterations)


def connected_components_keyed(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Undirected connected components by iterative hash-min label
    propagation over plain-typed (src, dst) keys (longs, strings, …).
    Returns (node, component) where component is the minimum key in the
    component. Converges in O(diameter) rounds; each round is one
    shuffle."""
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # candidate labels from neighbors
        nbr = (
            sym.join(labels, sym["src"] == labels["node"], "inner")
            .select(sym["dst"].alias("node"), F.col("component"))
        )
        new = (
            labels.select("node", "component").unionByName(nbr)
            .groupBy("node").agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
        )
        labels = new
        if changed.isEmpty():
            break
    return labels


def pagerank(
    edges: DataFrame, damping: float = 0.85, iterations: int = 10
) -> DataFrame:
    """Classic iterative PageRank over (src, dst) term edges. Returns
    (node, rank). Each iteration = one join + one aggregation; lineage
    checkpointed per round."""
    e = _edge_keys(edges).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant precomputation: degree rides on each edge (saves a
    # join per iteration; `rank / deg` arithmetic unchanged), and the
    # dangling set is STATIC — when it's empty the per-iteration
    # dangling-mass job disappears entirely
    ew = e.join(out_deg, "src").localCheckpoint(eager=True)
    dang = nodes.join(
        out_deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint(eager=True)
    n_dang = dang.count()
    # broadcast the static dangling set only while it plausibly fits an
    # executor (sink-heavy graphs — crawl frontiers, citation leaves —
    # can make it a large fraction of nodes); past the cap, fall back to
    # a shuffle join and let AQE pick the strategy
    dang_side = F.broadcast(dang) if n_dang <= 1_000_000 else dang
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # dangling nodes redistribute their mass uniformly (standard PR)
        dangling = (
            ranks.join(dang_side, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        ) if n_dang else 0.0
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"], "inner")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("contrib"))
        )
        base = (1 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
        ).localCheckpoint(eager=True)
    return ranks


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree) — the GraphDescription-style stat
    surface (QuadStore.swift:28-42)."""
    e = _edge_keys(edges)
    outd = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_degree"))
    return outd.join(ind, "node", "full_outer").na.fill(0)
