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
