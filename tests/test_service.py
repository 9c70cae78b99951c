"""SERVICE federation against a local mock SPARQL endpoint
(stdlib http.server serving canned application/sparql-results+json) —
the offline stand-in for the reference's SPARQLClient integration
(SPARQLClient.swift:14-99): exercises query serialization, the HTTP
round trip, JSON-bindings decode, the join of remote bindings into the
enclosing pattern, and the SILENT error path."""

import http.server
import json
import threading

import pytest

from kineo_spark.engine import Engine
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
G = "urn:g:default"


class _MockSparql(http.server.BaseHTTPRequestHandler):
    captured: list[str] = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        _MockSparql.captured.append(body)
        payload = {
            "head": {"vars": ["person", "name"]},
            "results": {"bindings": [
                {"person": {"type": "uri", "value": EX + "alice"},
                 "name": {"type": "literal", "value": "Alice Remote"}},
                {"person": {"type": "uri", "value": EX + "bob"},
                 "name": {"type": "literal", "value": "Bob Remote",
                          "datatype": "http://www.w3.org/2001/XMLSchema#string"}},
            ]},
        }
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def endpoint():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _MockSparql)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    srv.shutdown()


@pytest.fixture(scope="module")
def local_store(spark):
    rows = [
        (0, EX + "alice", EX + "age", 2, "30", "integer", None, 30.0, G),
        (0, EX + "carol", EX + "age", 2, "40", "integer", None, 40.0, G),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def test_service_join(local_store, endpoint):
    rows = Engine(local_store).query(f"""
      PREFIX ex: <{EX}>
      SELECT ?name ?age WHERE {{
        ?person ex:age ?age .
        SERVICE <{endpoint}> {{ ?person ex:name ?name }}
      }}
    """).bindings.collect()
    # remote knows alice+bob; local knows alice+carol → join = alice
    assert len(rows) == 1
    assert rows[0]["name"]["lex"] == "Alice Remote" and rows[0]["age"]["num"] == 30.0
    # the serialized sub-query reached the endpoint
    assert any("name" in c for c in _MockSparql.captured)


def test_service_bind_join_ships_values(local_store, endpoint):
    """local ⋈ SERVICE runs as a bind-join (federation §2.4): the remote
    query carries a VALUES block of the LHS's distinct shared bindings,
    so the endpoint only returns joinable rows."""
    _MockSparql.captured.clear()
    rows = Engine(local_store).query(f"""
      PREFIX ex: <{EX}>
      SELECT ?name ?age WHERE {{
        ?person ex:age ?age .
        SERVICE <{endpoint}> {{ ?person ex:name ?name }}
      }}
    """).bindings.collect()
    assert len(rows) == 1 and rows[0]["name"]["lex"] == "Alice Remote"
    from urllib.parse import unquote_plus
    sent = [unquote_plus(c) for c in _MockSparql.captured]
    assert any("VALUES (?person)" in q for q in sent), sent
    # both local subjects shipped, remote pattern constrained to them
    assert any("alice" in q and "carol" in q for q in sent)


def test_service_silent_error(local_store):
    rows = Engine(local_store).query(f"""
      PREFIX ex: <{EX}>
      SELECT ?age WHERE {{
        ?p ex:age ?age .
        SERVICE SILENT <http://127.0.0.1:9/nope> {{ ?p ex:name ?n }}
      }}
    """).bindings.collect()
    # SILENT degrades to a single empty remote solution: local rows survive
    assert {r["age"]["num"] for r in rows} == {30.0, 40.0}


def test_service_error_raises(local_store):
    with pytest.raises(Exception):
        Engine(local_store).query(f"""
          PREFIX ex: <{EX}>
          SELECT ?age WHERE {{
            ?p ex:age ?age .
            SERVICE <http://127.0.0.1:9/nope> {{ ?p ex:name ?n }}
          }}
        """).bindings.collect()


# --- SparqlEndpointStore: the endpoint as a QuadStore ----------------------

class _MockPatternEndpoint(http.server.BaseHTTPRequestHandler):
    """Answers pattern scans (SELECT * WHERE { ?s <p> ?o }) from a tiny
    in-memory graph, echoing the positional var names the store emits."""

    GRAPH = [
        (EX + "alice", EX + "name", ("literal", "Alice")),
        (EX + "bob", EX + "name", ("literal", "Bob")),
        (EX + "alice", EX + "knows", ("uri", EX + "bob")),
    ]
    captured: list[str] = []

    def do_POST(self):
        import re as _re
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        _MockPatternEndpoint.captured.append(body)
        from urllib.parse import unquote_plus
        q = unquote_plus(body.split("query=", 1)[1])
        m = _re.search(r"<([^>]+)>", q)  # bound predicate, if any
        pred = m.group(1) if m else None
        bindings = []
        for s, p, o in self.GRAPH:
            if pred is not None and p != pred:
                continue
            row = {"s": {"type": "uri", "value": s}}
            if pred is None:
                row["p"] = {"type": "uri", "value": p}
            row["o"] = {"type": o[0], "value": o[1]}
            bindings.append(row)
        payload = {"head": {"vars": ["s", "p", "o"] if pred is None else ["s", "o"]},
                   "results": {"bindings": bindings}}
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def pattern_endpoint():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _MockPatternEndpoint)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    srv.shutdown()


def test_endpoint_store_scan_and_join(spark, pattern_endpoint):
    """Engine over SparqlEndpointStore: each BGP pattern becomes one
    endpoint round trip; the join runs locally in Spark (the reference's
    SPARQLEndpointQuadStore role)."""
    from kineo_spark.sources.stores_ext import SparqlEndpointStore

    store = SparqlEndpointStore(spark, pattern_endpoint)
    eng = Engine(store)
    res = eng.query(f"""
        PREFIX ex: <{EX}>
        SELECT ?who ?name WHERE {{ ?who ex:knows ?other . ?other ex:name ?name }}
    """)
    rows = [(r["who"]["lex"], r["name"]["lex"]) for r in res.bindings.collect()]
    assert rows == [(EX + "alice", "Bob")]
    # one HTTP query per pattern, predicate bound in each
    assert sum("knows" in c for c in _MockPatternEndpoint.captured) >= 1
    assert sum("name" in c for c in _MockPatternEndpoint.captured) >= 1


class _MockSparqlXml(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        self.rfile.read(int(self.headers["Content-Length"]))
        data = (
            '<?xml version="1.0"?>'
            '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
            '<head><variable name="person"/><variable name="name"/></head>'
            '<results>'
            f'<result><binding name="person"><uri>{EX}alice</uri></binding>'
            '<binding name="name"><literal xml:lang="en">Alice XML</literal>'
            '</binding></result>'
            f'<result><binding name="person"><uri>{EX}bob</uri></binding>'
            '<binding name="name"><literal datatype='
            '"http://www.w3.org/2001/XMLSchema#string">Bob XML</literal>'
            '</binding></result>'
            '</results></sparql>'
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+xml; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


def test_service_xml_results(local_store):
    """A server answering in sparql-results+xml parses identically to
    the JSON path (content negotiation by response Content-Type)."""
    srv = http.server.HTTPServer(("127.0.0.1", 0), _MockSparqlXml)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from kineo_spark.service import fetch_bindings

        variables, rows = fetch_bindings(
            f"http://127.0.0.1:{srv.server_address[1]}/sparql",
            "SELECT ?person ?name WHERE { ?person <urn:name> ?name }")
        assert variables == ["person", "name"]
        m = {r[0][1]: r[1] for r in rows}
        assert m[EX + "alice"][1] == "Alice XML"
        assert m[EX + "alice"][3] == "en"       # lang tag preserved
        assert m[EX + "bob"][1] == "Bob XML"
    finally:
        srv.shutdown()


class _MockSparqlTsv(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        body = (
            "?person\t?name\n"
            f"<{EX}alice>\t\"Alice TSV\"@en\n"
            f"<{EX}bob>\t\"Bob TSV\"\n"
            f"<{EX}carol>\t42\n"
            f"<{EX}dave>\t\n"          # unbound ?name
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/tab-separated-values; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


def test_service_tsv_results(local_store):
    """A server answering in TSV parses like the JSON path: header of
    ?vars, Turtle-encoded cells, empty cell = unbound
    (SPARQLTSV.swift:103-153 parity)."""
    srv = http.server.HTTPServer(("127.0.0.1", 0), _MockSparqlTsv)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from kineo_spark.service import fetch_bindings

        variables, rows = fetch_bindings(
            f"http://127.0.0.1:{srv.server_address[1]}/sparql",
            "SELECT ?person ?name WHERE { ?person <urn:name> ?name }")
        assert variables == ["person", "name"]
        m = {r[0][1]: r[1] for r in rows}
        assert m[EX + "alice"][1] == "Alice TSV"
        assert m[EX + "alice"][3] == "en"
        assert m[EX + "bob"][1] == "Bob TSV"
        assert m[EX + "carol"][2] == "integer" and m[EX + "carol"][4] == 42.0
        assert m[EX + "dave"] is None
    finally:
        srv.shutdown()


def test_tsv_roundtrip_through_serializer(spark, local_store):
    """to_sparql_tsv output re-parses to the same terms."""
    from kineo_spark.serializers import to_sparql_tsv
    from kineo_spark.service import _parse_tsv
    from kineo_spark.engine import Engine

    eng = Engine(local_store)
    r = eng.query("SELECT ?s ?name WHERE { ?s <urn:name> ?name }")
    tsv = to_sparql_tsv(r.bindings)
    variables, rows = _parse_tsv(tsv.encode())
    assert variables == ["s", "name"]
    got = {r_[0][1]: r_[1][1] for r_ in rows}
    spark_rows = {row.s.lex: row.name.lex for row in r.bindings.collect()}
    assert got == spark_rows


def test_service_bind_join_chunks_large_seed(spark, endpoint):
    """LHS seed sets above BIND_JOIN_MAX ship as multiple sequential
    VALUES chunks whose remote results concatenate (federation §2.4 at
    scale) instead of falling back to the unconstrained fetch."""
    from kineo_spark import service as svc

    rows = [
        (0, EX + f"p{i}", EX + "age", 2, str(i), "integer", None, float(i), G)
        for i in range(svc.BIND_JOIN_MAX + 50)
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    _MockSparql.captured.clear()
    out = Engine(store).query(f"""
      PREFIX ex: <{EX}>
      SELECT ?name ?age WHERE {{
        ?person ex:age ?age .
        SERVICE <{endpoint}> {{ ?person ex:name ?name }}
      }}
    """).bindings.collect()
    from urllib.parse import unquote_plus
    sent = [unquote_plus(c) for c in _MockSparql.captured]
    values_reqs = [q for q in sent if "VALUES (?person)" in q]
    assert len(values_reqs) == 2  # 550 seeds -> 500 + 50
    # every chunk's canned response (alice+bob) came back; only rows
    # with a local join partner survive — none here (p0..p549), so the
    # join is empty, but the fetch itself concatenated both chunks
    assert out == []
