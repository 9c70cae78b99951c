"""SPARQL result serializers: JSON / XML / TSV / CSV, plus helpers.

Reference: SPARQL-JSON (/root/reference/Sources/Kineo/SPARQL/
SPARQLJSON.swift:52-109), SPARQL-XML (SPARQLXML.swift:14-275), TSV
(SPARQLTSV.swift:11-153), with content negotiation
(SPARQLClient.swift:101-189). Serialization is a driver-side concern on
collected rows (result sets are human-scale); graph dumps go through
sources/ntriples.py which is fully distributed.
"""

from __future__ import annotations

import io
import json
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

from kineo_spark.model import DT_IRI, KIND_BLANK, KIND_IRI, KIND_QUOTED, PyTerm


def _term_of_row_value(v) -> PyTerm | None:
    if v is None:
        return None
    return PyTerm(v["kind"], v["lex"], v["dt"], v["lang"])


def _rows(df: DataFrame):
    cols = [c for c in df.columns if not c.startswith("__")]
    for row in df.toLocalIterator():
        yield {c: _term_of_row_value(row[c]) for c in cols}


def _json_term(t: PyTerm) -> dict:
    if t.kind == KIND_IRI:
        return {"type": "uri", "value": t.lex}
    if t.kind == KIND_BLANK:
        return {"type": "bnode", "value": t.lex}
    if t.kind == KIND_QUOTED:
        # SPARQL 1.2 results JSON quoted-triple term
        from kineo_spark.model import quoted_parts

        s, p, o = quoted_parts(t)
        return {"type": "triple", "value": {
            "subject": _json_term(s), "predicate": _json_term(p),
            "object": _json_term(o)}}
    out = {"type": "literal", "value": t.lex}
    if t.lang:
        out["xml:lang"] = t.lang
    elif t.dt and t.dt != "string":
        out["datatype"] = DT_IRI.get(t.dt, t.dt)
    return out


def to_sparql_json(df: DataFrame) -> str:
    """application/sparql-results+json (SPARQLJSON.swift:52-109)."""
    cols = [c for c in df.columns if not c.startswith("__")]
    bindings = []
    for row in _rows(df):
        bindings.append({c: _json_term(t) for c, t in row.items() if t is not None})
    return json.dumps({"head": {"vars": cols}, "results": {"bindings": bindings}})


def ask_to_sparql_json(value: bool) -> str:
    return json.dumps({"head": {}, "boolean": value})


def to_sparql_xml(df: DataFrame) -> str:
    """application/sparql-results+xml (SPARQLXML.swift:14-275)."""
    cols = [c for c in df.columns if not c.startswith("__")]
    out = io.StringIO()
    out.write('<?xml version="1.0"?>\n')
    out.write('<sparql xmlns="http://www.w3.org/2005/sparql-results#">')
    out.write("<head>")
    for c in cols:
        out.write(f'<variable name="{escape(c)}"/>')
    out.write("</head><results>")
    for row in _rows(df):
        out.write("<result>")
        for c, t in row.items():
            if t is None:
                continue
            out.write(f'<binding name="{escape(c)}">')
            if t.kind == KIND_QUOTED:
                out.write(_xml_triple(t))
            elif t.kind == KIND_IRI:
                out.write(f"<uri>{escape(t.lex)}</uri>")
            elif t.kind == KIND_BLANK:
                out.write(f"<bnode>{escape(t.lex)}</bnode>")
            elif t.lang:
                out.write(f'<literal xml:lang="{escape(t.lang)}">{escape(t.lex)}</literal>')
            elif t.dt and t.dt != "string":
                out.write(f'<literal datatype="{escape(DT_IRI.get(t.dt, t.dt))}">{escape(t.lex)}</literal>')
            else:
                out.write(f"<literal>{escape(t.lex)}</literal>")
            out.write("</binding>")
        out.write("</result>")
    out.write("</results></sparql>")
    return out.getvalue()


def _xml_triple(t: PyTerm) -> str:
    """SPARQL 1.2 results-XML quoted-triple term (recursive)."""
    from kineo_spark.model import quoted_parts

    def part(x: PyTerm) -> str:
        if x.kind == KIND_QUOTED:
            return _xml_triple(x)
        if x.kind == KIND_IRI:
            return f"<uri>{escape(x.lex)}</uri>"
        if x.kind == KIND_BLANK:
            return f"<bnode>{escape(x.lex)}</bnode>"
        if x.lang:
            return f'<literal xml:lang="{escape(x.lang)}">{escape(x.lex)}</literal>'
        if x.dt and x.dt != "string":
            return f'<literal datatype="{escape(DT_IRI.get(x.dt, x.dt))}">{escape(x.lex)}</literal>'
        return f"<literal>{escape(x.lex)}</literal>"

    s, p, o = quoted_parts(t)
    return ("<triple><subject>" + part(s) + "</subject><predicate>"
            + part(p) + "</predicate><object>" + part(o)
            + "</object></triple>")


def to_sparql_tsv(df: DataFrame) -> str:
    """text/tab-separated-values (SPARQLTSV.swift:11-153): terms in
    Turtle/N-Triples syntax, unbound empty."""
    cols = [c for c in df.columns if not c.startswith("__")]
    lines = ["\t".join("?" + c for c in cols)]
    for row in _rows(df):
        lines.append("\t".join("" if row[c] is None else row[c].n3() for c in cols))
    return "\n".join(lines) + "\n"


def to_sparql_csv(df: DataFrame) -> str:
    """text/csv per SPARQL 1.1 results CSV: plain lexical values."""
    import csv

    cols = [c for c in df.columns if not c.startswith("__")]
    out = io.StringIO()
    w = csv.writer(out, lineterminator="\n")
    w.writerow(cols)
    for row in _rows(df):
        w.writerow([
            "" if row[c] is None
            else (row[c].n3() if row[c].kind == KIND_QUOTED else row[c].lex)
            for c in cols
        ])
    return out.getvalue()


CONTENT_TYPES = {
    "application/sparql-results+json": to_sparql_json,
    "application/sparql-results+xml": to_sparql_xml,
    "text/tab-separated-values": to_sparql_tsv,
    "text/csv": to_sparql_csv,
}


def negotiate(accept: str):
    """Pick a serializer from an Accept header (SPARQLClient.swift:101-189)."""
    for part in accept.split(","):
        mt = part.split(";")[0].strip()
        if mt in CONTENT_TYPES:
            return mt, CONTENT_TYPES[mt]
    return "application/sparql-results+json", to_sparql_json
