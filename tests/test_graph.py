"""Graph API + analytics tests (chain + cycle + disconnected fixture)."""

import pytest
from pyspark.sql import functions as F

from kineo_spark import algebra as A
from kineo_spark.graph import Graph, connected_components, degree_stats, pagerank
from kineo_spark.model import iri
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
KNOWS = EX + "knows"


@pytest.fixture(scope="module")
def gstore(spark):
    def q(s, o):
        return (0, EX + s, KNOWS, 0, EX + o, None, None, None, "g")

    rows = [
        q("a", "b"), q("b", "c"), q("c", "d"),       # chain component
        q("x", "y"), q("y", "x"),                     # 2-cycle component
        (0, EX + "z", EX + "likes", 2, "5", "integer", None, 5.0, "g"),  # literal edge
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def test_graph_navigation(gstore):
    g = Graph(gstore)
    out = g.outgoing(iri(KNOWS))
    assert out.count() == 5
    inc = g.incoming(iri(KNOWS))
    assert {r["node"]["lex"].split("/")[-1] for r in inc.collect()} == {"b", "c", "d", "x", "y"}
    edges = g.edges()
    assert edges.count() == 5  # literal-valued edge excluded
    assert g.graphs().count() == 1


def test_connected_components(gstore):
    g = Graph(gstore)
    cc = connected_components(g.edges(iri(KNOWS)))
    rows = {r["node"].split("\x01")[1].split("/")[-1]: r["component"] for r in cc.collect()}
    assert rows["a"] == rows["b"] == rows["c"] == rows["d"]
    assert rows["x"] == rows["y"]
    assert rows["a"] != rows["x"]


def test_pagerank_and_degrees(gstore):
    g = Graph(gstore)
    def short(key):
        return key.split("\x01")[1].split("/")[-1]

    pr = pagerank(g.edges(iri(KNOWS)), iterations=5)
    ranks = {short(r["node"]): r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # dangling mass recycled
    assert ranks["d"] > ranks["a"]  # chain sink accumulates rank
    deg = degree_stats(g.edges(iri(KNOWS)))
    m = {short(r["node"]): (r["out_degree"], r["in_degree"]) for r in deg.collect()}
    assert m["b"] == (1, 1)


def test_pagerank_matches_reference_power_iteration(spark):
    """Exact agreement (1e-9) with a pure-Python power iteration using
    the same damping/dangling policy — not just invariants."""
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    rows = [(0, EX + s, KNOWS, 0, EX + o, None, None, None, "g") for s, o in edges]
    # e has no outlinks -> dangling
    rows.append((0, EX + "c", EX + "knows2", 0, EX + "e", None, None, None, "g"))
    store = QuadsDataFrameStore.from_rows(spark, rows)
    g = Graph(store)
    all_edges = g.edges(iri(KNOWS)).unionByName(g.edges(iri(EX + "knows2")))
    got = {
        r["node"].split("\x01")[1].split("/")[-1]: r["rank"]
        for r in pagerank(all_edges, damping=0.85, iterations=15).collect()
    }

    adj = {"a": ["b", "c"], "b": ["c"], "c": ["a", "e"], "d": ["c"]}
    nodes = sorted({x for e in edges for x in e} | {"e"})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(15):
        dangling = sum(rank[v] for v in nodes if v not in adj)
        contrib = {v: 0.0 for v in nodes}
        for u, outs in adj.items():
            for w in outs:
                contrib[w] += rank[u] / len(outs)
        base = (1 - 0.85) / n + 0.85 * dangling / n
        rank = {v: base + 0.85 * contrib[v] for v in nodes}
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
