"""Triple Pattern Fragments client store.

Spark-first analog of the reference's TPF client
(``QuadStore/TriplePatternFragmentQuadStore.swift:22-386``): a quad
store whose pattern scans are HTTP GETs against a TPF server — the URL
is built from the server's hypermedia URI template, each response page
is an RDF document carrying both matching data triples and hydra
paging/search controls, and ``hydra:nextPage`` links are followed until
the fragment is exhausted (``quads(matching:)``, swift :116-156).

Like the reference (and the SPARQL-endpoint store here), fetching is
driver-side: TPF is a low-volume remote-fragment interface, not a bulk
path — each page is small by design. The fetched fragment lands in a
DataFrame, so everything above the scan (joins, filters, aggregation)
is ordinary distributed Catalyst work, and Catalyst will typically
broadcast the (small) fragment side of any join.

Hypermedia control discovery mirrors ``loadHypermediaControls``
(swift :170-230): the start fragment is parsed for a ``hydra:search``
control with ``hydra:template`` and per-position ``hydra:mapping``
(variable name × rdf:subject/predicate/object property).
"""

from __future__ import annotations

import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from kineo_spark import algebra as A
from kineo_spark.model import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    QUADS_SCHEMA,
    PyTerm,
)
from kineo_spark.store import QuadStore, QuadsDataFrameStore

HYDRA = "http://www.w3.org/ns/hydra/core#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_POSITIONS = ("subject", "predicate", "object")


def expand_template(template: str, values: dict[str, str]) -> str:
    """Minimal RFC 6570 expansion for the form-style query expressions
    TPF servers use: ``{?subject,predicate,object}`` / ``{&s,p,o}``.
    Unset variables are simply omitted (level-3 semantics)."""
    import re

    def repl(m):
        op = m.group(1)
        names = m.group(2).split(",")
        pairs = [
            (n, values[n]) for n in names if values.get(n) not in (None, "")
        ]
        if not pairs:
            return ""
        sep = "&"
        lead = op if op in ("?", "&") else ""
        body = sep.join(
            f"{n}={urllib.parse.quote(v, safe='')}" for n, v in pairs
        )
        return lead + body

    return re.sub(r"\{([?&]?)([A-Za-z0-9_,%.]+)\}", repl, template)


def _term_tpf_repr(t: PyTerm) -> str:
    """Serialize a bound pattern term the way TPF query params expect:
    bare IRI, or an N-Triples-style literal."""
    if t.kind == KIND_IRI:
        return t.lex
    if t.kind == KIND_BLANK:
        return f"_:{t.lex}"
    if t.lang:
        return f'"{t.lex}"@{t.lang}'
    if t.dt and t.dt not in ("string",):
        from kineo_spark.model import DT_IRI

        return f'"{t.lex}"^^<{DT_IRI.get(t.dt, t.dt)}>'
    return f'"{t.lex}"'


class TPFQuadStore(QuadStore):
    """Quad store backed by a remote Triple Pattern Fragments server.

    ``start_url`` is any fragment of the dataset; its hydra controls
    give the search template. A ``template`` may be passed directly to
    skip discovery. TPF datasets are triple-shaped: every quad carries
    ``default_graph`` (reference ``graphsCount == 1``, swift :70)."""

    def __init__(
        self,
        spark: SparkSession,
        start_url: str | None = None,
        template: str | None = None,
        var_names: tuple[str, str, str] | None = None,
        default_graph: str = "urn:g:default",
        max_pages: int = 1000,
    ):
        self.spark = spark
        self.default_graph = default_graph
        self.max_pages = max_pages
        if template is not None:
            self.template = template
            self.var_names = dict(zip(_POSITIONS, var_names or _POSITIONS))
        else:
            if start_url is None:
                raise ValueError("TPFQuadStore needs start_url or template")
            self.template, self.var_names = self._load_controls(start_url)

    # -- hypermedia controls ------------------------------------------------

    def _get(self, url: str) -> list[tuple]:
        """GET one fragment page → flat quad rows (QUADS_SCHEMA)."""
        from kineo_spark.sources.turtle import TurtleParser

        req = urllib.request.Request(
            url, headers={"Accept": "text/turtle, application/n-triples"}
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            text = resp.read().decode("utf-8")
        return TurtleParser(
            text, self.default_graph, base=url
        ).parse()

    def _load_controls(self, start_url: str):
        """Discover the search template + variable names from the start
        fragment (``loadHypermediaControls``, swift :170-230)."""
        rows = self._get(start_url)
        # (?ds hydra:search ?tpl) ; (?tpl hydra:template ?template)
        search_nodes = {
            r[4] for r in rows if r[2] == HYDRA + "search"
        }
        template = None
        tpl_node = None
        for r in rows:
            if r[2] == HYDRA + "template" and (
                not search_nodes or r[1] in search_nodes
            ):
                template, tpl_node = r[4], r[1]
                break
        if template is None:
            raise ValueError(f"no hydra:template control at {start_url}")
        # mappings: (?tpl hydra:mapping ?m), (?m hydra:variable "s"),
        #           (?m hydra:property rdf:subject)
        mapping_nodes = {
            r[4] for r in rows
            if r[2] == HYDRA + "mapping" and r[1] == tpl_node
        }
        var_of: dict[str, str] = {}
        for m in mapping_nodes:
            var = prop = None
            for r in rows:
                if r[1] != m:
                    continue
                if r[2] == HYDRA + "variable":
                    var = r[4]
                elif r[2] == HYDRA + "property":
                    prop = r[4]
            if var and prop and prop.startswith(RDF):
                var_of[prop[len(RDF):]] = var
        names = {pos: var_of.get(pos, pos) for pos in _POSITIONS}
        return template, names

    # -- fragment paging ----------------------------------------------------

    def _pattern_url(self, pattern: A.QuadPattern) -> str:
        values: dict[str, str] = {}
        for pos, node in zip(_POSITIONS, (pattern.s, pattern.p, pattern.o)):
            if isinstance(node, PyTerm):
                values[self.var_names[pos]] = _term_tpf_repr(node)
        return expand_template(self.template, values)

    @staticmethod
    def _matches(row: tuple, pattern: A.QuadPattern) -> bool:
        """Driver-side constant-position match of a flat quad row —
        the per-page ``store.quads(matching: pattern)`` of swift :142.
        Pages also carry hydra/void metadata triples; only rows that
        match the requested pattern are data."""
        s, p, o = pattern.s, pattern.p, pattern.o
        g = pattern.g
        if isinstance(g, PyTerm) and row[8] != g.lex:
            return False
        if isinstance(s, PyTerm) and (row[0], row[1]) != (s.kind, s.lex):
            return False
        if isinstance(p, PyTerm) and row[2] != p.lex:
            return False
        if isinstance(o, PyTerm):
            if row[3] != o.kind or row[4] != o.lex:
                return False
            if o.kind == KIND_LITERAL and (row[5], row[6]) != (o.dt, o.lang):
                return False
        return True

    def _next_url(self, rows: list[tuple], page_url: str) -> str | None:
        for r in rows:
            if r[2] in (HYDRA + "nextPage", HYDRA + "next"):
                return r[4]
        return None

    def fetch(self, pattern: A.QuadPattern) -> list[tuple]:
        """All quad rows matching ``pattern``, following nextPage links
        (swift :116-156, incl. the seen-URL cycle guard)."""
        url = self._pattern_url(pattern)
        seen: set[str] = set()
        out: list[tuple] = []
        for _ in range(self.max_pages):
            if url in seen:
                break
            seen.add(url)
            rows = self._get(url)
            out.extend(r for r in rows if self._matches(r, pattern))
            nxt = self._next_url(rows, url)
            if not nxt or nxt == url:
                break
            url = nxt
        return out

    # -- QuadStore surface ---------------------------------------------------

    def scan(self, pattern: A.QuadPattern) -> DataFrame:
        rows = self.fetch(pattern)
        df = self.spark.createDataFrame(rows, QUADS_SCHEMA)
        return QuadsDataFrameStore(self.spark, df).scan(pattern)

    def quads(self) -> DataFrame:
        pattern = A.QuadPattern(
            A.Var("s"), A.Var("p"), A.Var("o"), A.Var("g")
        )
        rows = self.fetch(pattern)
        return self.spark.createDataFrame(rows, QUADS_SCHEMA)
