"""TPF client store against a local mock Triple Pattern Fragments
server (stdlib http.server emitting Turtle fragments with hydra
search/paging controls) — the offline stand-in for the reference's
client (TriplePatternFragmentQuadStore.swift:22-386): exercises
hypermedia-control discovery, template expansion, per-pattern fragment
filtering, nextPage paging with the cycle guard, and the join of a
fetched fragment into an enclosing engine query."""

import http.server
import threading
import urllib.parse

import pytest

from kineo_spark import algebra as A
from kineo_spark.model import PyTerm, iri
from kineo_spark.sources.tpf import TPFQuadStore, expand_template

EX = "http://example.org/"
PAGE_SIZE = 2

# (s, p, o) — o as IRI string or ("lit", text)
DATA = [
    (EX + "alice", EX + "knows", EX + "bob"),
    (EX + "alice", EX + "knows", EX + "carol"),
    (EX + "bob", EX + "knows", EX + "carol"),
    (EX + "alice", EX + "name", ("lit", "Alice")),
    (EX + "bob", EX + "name", ("lit", "Bob")),
    (EX + "carol", EX + "name", ("lit", "Carol")),
]


def _nt(t):
    if isinstance(t, tuple):
        return f'"{t[1]}"'
    return f"<{t}>"


class _MockTPF(http.server.BaseHTTPRequestHandler):
    port = 0
    requests: list[str] = []

    def do_GET(self):
        _MockTPF.requests.append(self.path)
        parsed = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(parsed.query)
        base = f"http://127.0.0.1:{_MockTPF.port}"

        def want(pos, val):
            sel = q.get(pos, [None])[0]
            if sel is None:
                return True
            if isinstance(val, tuple):
                return sel == f'"{val[1]}"'
            return sel == val

        rows = [
            t for t in DATA
            if want("subject", t[0]) and want("predicate", t[1])
            and want("object", t[2])
        ]
        page = int(q.get("page", ["1"])[0])
        chunk = rows[(page - 1) * PAGE_SIZE: page * PAGE_SIZE]

        frag_q = {k: v[0] for k, v in q.items() if k != "page"}
        this_url = base + "/f"
        if frag_q or page > 1:
            frag_q["page"] = str(page)
            this_url += "?" + urllib.parse.urlencode(frag_q)

        lines = [f"{_nt(s)} {_nt(p)} {_nt(o)} ." for s, p, o in chunk]
        # hydra search control (on every page, like a real LDF server)
        hy = "http://www.w3.org/ns/hydra/core#"
        rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        lines += [
            f"<{base}/#dataset> <{hy}search> _:tpl .",
            f'_:tpl <{hy}template> "{base}/f{{?subject,predicate,object}}" .',
            f"_:tpl <{hy}mapping> _:ms , _:mp , _:mo .",
            f'_:ms <{hy}variable> "subject" .',
            f"_:ms <{hy}property> <{rdf}subject> .",
            f'_:mp <{hy}variable> "predicate" .',
            f"_:mp <{hy}property> <{rdf}predicate> .",
            f'_:mo <{hy}variable> "object" .',
            f"_:mo <{hy}property> <{rdf}object> .",
        ]
        if len(rows) > page * PAGE_SIZE:
            nxt = dict(frag_q)
            nxt["page"] = str(page + 1)
            next_url = base + "/f?" + urllib.parse.urlencode(nxt)
            lines.append(f"<{this_url}> <{hy}nextPage> <{next_url}> .")
        data = "\n".join(lines).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/turtle")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def tpf_url():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _MockTPF)
    _MockTPF.port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/f"
    srv.shutdown()


def test_expand_template():
    tpl = "http://x/f{?subject,predicate,object}"
    assert expand_template(tpl, {}) == "http://x/f"
    assert (
        expand_template(tpl, {"predicate": "http://p"})
        == "http://x/f?predicate=http%3A%2F%2Fp"
    )
    assert expand_template(tpl, {"subject": "a", "object": "b"}) \
        == "http://x/f?subject=a&object=b"


def test_control_discovery(tpf_url, spark):
    store = TPFQuadStore(spark, start_url=tpf_url)
    assert store.template.endswith("/f{?subject,predicate,object}")
    assert store.var_names == {
        "subject": "subject", "predicate": "predicate", "object": "object"
    }


def test_pattern_scan_pages(tpf_url, spark):
    store = TPFQuadStore(spark, start_url=tpf_url)
    _MockTPF.requests.clear()
    pat = A.QuadPattern(
        A.Var("s"), iri(EX + "knows"), A.Var("o"), A.Var("g", binding=False)
    )
    rows = store.fetch(pat)
    assert len(rows) == 3  # 2 pages: PAGE_SIZE + 1
    assert sum("page=2" in r for r in _MockTPF.requests) == 1
    # predicate constant was pushed into the fragment URL
    assert all("predicate=" in r for r in _MockTPF.requests)

    df = store.scan(pat)
    assert sorted(df.columns) == ["o", "s"]
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert got == {
        (EX + "alice", EX + "bob"),
        (EX + "alice", EX + "carol"),
        (EX + "bob", EX + "carol"),
    }


def test_bound_object_literal(tpf_url, spark):
    store = TPFQuadStore(spark, start_url=tpf_url)
    pat = A.QuadPattern(
        A.Var("s"), iri(EX + "name"), PyTerm(2, "Alice", "string", None),
        A.Var("g", binding=False),
    )
    rows = store.fetch(pat)
    assert len(rows) == 1 and rows[0][1] == EX + "alice"


def test_engine_join_over_tpf(tpf_url, spark):
    """Full engine query over the TPF store: BGP join of two fetched
    fragments runs as ordinary Catalyst work."""
    from kineo_spark.engine import Engine

    eng = Engine(TPFQuadStore(spark, start_url=tpf_url))
    res = eng.query(
        f"SELECT ?n WHERE {{ ?s <{EX}knows> <{EX}carol> . "
        f"?s <{EX}name> ?n }} ORDER BY ?n"
    )
    names = [r["n"]["lex"] for r in res.bindings.collect()]
    assert names == ["Alice", "Bob"]
