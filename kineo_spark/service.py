"""SERVICE federation (SURVEY §2.10).

Reference: the sub-algebra is serialized back to SPARQL, sent over HTTP,
and the returned bindings joined in (QueryPlanner.swift:819-833;
MaterializedQueryPlan.swift:669-703; SPARQLClient.swift:14-99). SILENT
degrades to a single empty solution on error (SPARQLClient.swift:90-97).

Spark shape: the HTTP round-trip happens on the driver (it is inherently
a single remote call), the result rows become a small DataFrame that
Catalyst will typically broadcast into the enclosing join.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql import types as T

from kineo_spark import algebra as A
from kineo_spark.model import KIND_BLANK, KIND_IRI, KIND_LITERAL, IRI_DT, NUMERIC_DTS, TERM_SCHEMA


def _term_from_json(d: dict):
    if d is None:
        return None
    typ = d.get("type")
    val = d.get("value", "")
    if typ == "uri":
        return (KIND_IRI, val, None, None, None)
    if typ == "bnode":
        return (KIND_BLANK, val, None, None, None)
    lang = d.get("xml:lang")
    if lang:
        return (KIND_LITERAL, val, "langString", lang, None)
    dt_iri = d.get("datatype")
    dt = IRI_DT.get(dt_iri, dt_iri) if dt_iri else "string"
    num = None
    if dt in NUMERIC_DTS:
        try:
            num = float(val)
        except ValueError:
            num = None
    return (KIND_LITERAL, val, dt, None, num)


_SRX_NS = "{http://www.w3.org/2005/sparql-results#}"


def _parse_srx(body: bytes):
    """application/sparql-results+xml reader (the writer lives in
    serializers.py; SPARQLClient.swift negotiates both formats)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(body)
    variables = [
        v.get("name") for v in root.findall(f"{_SRX_NS}head/{_SRX_NS}variable")
    ]
    rows = []
    for res in root.findall(f"{_SRX_NS}results/{_SRX_NS}result"):
        byname = {}
        for b in res.findall(f"{_SRX_NS}binding"):
            child = list(b)[0]
            tag = child.tag.rsplit("}", 1)[-1]
            if tag == "uri":
                byname[b.get("name")] = {"type": "uri", "value": child.text or ""}
            elif tag == "bnode":
                byname[b.get("name")] = {"type": "bnode", "value": child.text or ""}
            else:
                d = {"type": "literal", "value": child.text or ""}
                lang = child.get("{http://www.w3.org/XML/1998/namespace}lang")
                if lang:
                    d["xml:lang"] = lang
                if child.get("datatype"):
                    d["datatype"] = child.get("datatype")
                byname[b.get("name")] = d
        rows.append(tuple(_term_from_json(byname.get(v)) for v in variables))
    return variables, rows


def _parse_tsv(body: bytes):
    """text/tab-separated-values results (SPARQLTSVParser,
    SPARQLTSV.swift:103-153): header of ?var names, rows of
    Turtle/N-Triples-encoded terms, unbound = empty cell. Each cell is
    parsed as a Turtle object — the same `<> <> cell .` trick the
    reference uses."""
    from kineo_spark.sources.turtle import TurtleParser

    lines = [ln for ln in body.decode("utf-8").split("\n") if ln != ""]
    if not lines:
        return [], []
    variables = [h.lstrip("?") for h in lines[0].split("\t")]
    rows = []
    for ln in lines[1:]:
        row = []
        for c in ln.split("\t"):
            if c == "":
                row.append(None)
                continue
            tp = TurtleParser(f"<urn:x> <urn:x> {c} .")
            tp.parse()
            _k0, _s, _p, k, lex, dt, lang, num, _g = tp.quads[0]
            row.append((k, lex, dt, lang, num))
        row += [None] * (len(variables) - len(row))
        rows.append(tuple(row[: len(variables)]))
    return variables, rows


# Endpoint indirection for conformance/test harnesses: a manifest can
# declare SERVICE <urn:ep1> while the actual data is served by a local
# mock spun up at run time (rdf-tests protocol#... federation entries
# work the same way — the declared endpoint IRI is symbolic). The W3C
# runner (w3c.py) registers aliases here; production queries never do.
ENDPOINT_ALIASES: dict[str, str] = {}


def fetch_bindings(endpoint: str, sparql: str, timeout: int = 30):
    """POST a SPARQL query; parse sparql-results+json, +xml or
    text/tab-separated-values by the response Content-Type (content
    negotiation, SPARQLClient.swift:101-189; TSV parser parity with
    SPARQLTSV.swift:103-153)."""
    endpoint = ENDPOINT_ALIASES.get(endpoint, endpoint)
    data = urllib.parse.urlencode({"query": sparql}).encode()
    req = urllib.request.Request(
        endpoint, data=data,
        headers={"Accept": "application/sparql-results+json, "
                           "application/sparql-results+xml;q=0.9, "
                           "text/tab-separated-values;q=0.8"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        ctype = (resp.headers.get("Content-Type") or "").split(";")[0].strip()
        body = resp.read()
    if ctype == "application/sparql-results+xml":
        return _parse_srx(body)
    if ctype == "text/tab-separated-values":
        return _parse_tsv(body)
    payload = json.loads(body)
    variables = payload["head"]["vars"]
    rows = []
    for b in payload["results"]["bindings"]:
        rows.append(tuple(_term_from_json(b.get(v)) for v in variables))
    return variables, rows


def eval_service(compiler, node: A.Service):
    from kineo_spark.compiler import Plan
    from kineo_spark.sparql_text import algebra_to_sparql

    if getattr(compiler, "plans_only", False):
        # side-effect-free planning (explain()): no HTTP. Placeholder
        # empty result with the SERVICE pattern's variables.
        svars: set[str] = set()
        _algebra_vars(node.child, svars)
        schema = T.StructType(
            [T.StructField(v, TERM_SCHEMA) for v in sorted(svars)])
        return Plan(compiler.spark.createDataFrame([], schema), frozenset())
    try:
        sparql = algebra_to_sparql(node.child)
        variables, rows = fetch_bindings(node.endpoint, sparql)
        schema = T.StructType([T.StructField(v, TERM_SCHEMA) for v in variables])
        df = compiler.spark.createDataFrame(rows, schema)
        return Plan(df, frozenset())
    except Exception:
        if node.silent:
            return Plan(compiler.spark.range(1).drop("id"), frozenset())
        raise


# -- bound join (SPARQL 1.1 Federated Query §2.4) ---------------------------

# max distinct LHS bindings per VALUES block (some endpoints cap query
# size); larger seed sets ship as up to BIND_JOIN_MAX_CHUNKS sequential
# requests whose results concatenate — beyond that the unconstrained
# fetch is usually cheaper than thousands of remote VALUES probes
BIND_JOIN_MAX = 500
BIND_JOIN_MAX_CHUNKS = 20


def _algebra_vars(n, out: set) -> None:
    """Binding variables mentioned anywhere under an algebra node."""
    import dataclasses

    if isinstance(n, A.Var):
        if n.binding:
            out.add(n.name)
        return
    if dataclasses.is_dataclass(n) and not isinstance(n, type):
        for f in dataclasses.fields(n):
            _algebra_vars(getattr(n, f.name), out)
    elif isinstance(n, (list, tuple)):
        for x in n:
            _algebra_vars(x, out)


def eval_service_bound(compiler, node: A.Service, left_plan):
    """Bind-join: constrain the remote query with a ``VALUES`` block of
    the LHS's distinct shared bindings (the federation §2.4 pattern the
    reference realizes by looping bindings through SPARQLClient).
    Returns the remote Plan, or None to fall back to the unconstrained
    fetch (no shared vars, too many bindings, or bnodes — which have no
    cross-endpoint identity and cannot be shipped)."""
    from kineo_spark.compiler import Plan
    from kineo_spark.model import PyTerm

    svars: set[str] = set()
    _algebra_vars(node.child, svars)
    shared = sorted(v for v in left_plan.certain
                    if v in svars and v in left_plan.df.columns
                    and v not in left_plan.id_vars)
    if not shared:
        return None
    try:
        # the LHS DataFrame is consumed twice (VALUES probe here, then
        # the actual join) — persist so the probe's work is reused
        left_plan.df = left_plan.df.persist()
        rows = (left_plan.df.select(*shared).distinct()
                .limit(BIND_JOIN_MAX * BIND_JOIN_MAX_CHUNKS + 1).collect())
    except Exception:
        return None
    if len(rows) > BIND_JOIN_MAX * BIND_JOIN_MAX_CHUNKS or not rows:
        return None
    pyrows = []
    for r in rows:
        terms = []
        for v in shared:
            t = r[v]
            if t is None:
                terms.append(None)
            elif t["kind"] == KIND_BLANK:
                return None
            else:
                terms.append(PyTerm(t["kind"], t["lex"], t["dt"], t["lang"]))
        pyrows.append(tuple(terms))
    try:
        from kineo_spark.sparql_text import algebra_to_sparql

        variables: list[str] | None = None
        all_rows: list[tuple] = []
        for i in range(0, len(pyrows), BIND_JOIN_MAX):
            constrained = A.Join(
                A.Table(tuple(shared), tuple(pyrows[i:i + BIND_JOIN_MAX])),
                node.child)
            vars_i, rrows = fetch_bindings(
                node.endpoint, algebra_to_sparql(constrained))
            if variables is None:
                variables = vars_i
            elif vars_i != variables:
                # endpoints may reorder/omit head vars per request —
                # realign by name, padding missing ones with unbound
                idx = [vars_i.index(v) if v in vars_i else None
                       for v in variables]
                rrows = [tuple(r[j] if j is not None else None for j in idx)
                         for r in rrows]
            all_rows.extend(rrows)
        schema = T.StructType(
            [T.StructField(v, TERM_SCHEMA) for v in variables or []])
        return Plan(compiler.spark.createDataFrame(all_rows, schema),
                    frozenset())
    except Exception:
        if node.silent:
            return Plan(compiler.spark.range(1).drop("id"), frozenset())
        raise
