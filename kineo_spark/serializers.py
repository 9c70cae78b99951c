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

from kineo_spark.model import (DT_IRI, IRI_DT, KIND_BLANK, KIND_IRI,
                               KIND_LITERAL, KIND_QUOTED, PyTerm)


def _term_of_row_value(v) -> PyTerm | None:
    if v is None:
        return None
    return PyTerm(v["kind"], v["lex"], v["dt"], v["lang"])


def _rows(df: DataFrame):
    # collect(), not toLocalIterator(): the serializers build the whole
    # output string in memory anyway (result sets are human-scale), and
    # toLocalIterator runs ONE SEQUENTIAL JOB PER PARTITION — a
    # many-partition result df turned each serialization into hundreds
    # of tiny Spark jobs (r9, surfaced by the csv-tsv-res round-trips)
    cols = [c for c in df.columns if not c.startswith("__")]
    for row in df.collect():
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


def _tsv_term(t: PyTerm) -> str:
    """One TSV cell: Turtle/N-Triples term syntax with the TWO
    TSV-specific rules (csv-tsv-res spec §4 / SPARQLTSV.swift:11-153):
    xsd:integer literals abbreviate to the bare lexical form, and tab /
    CR are backslash-escaped inside literals (a raw tab would break the
    column framing; n3() already escapes backslash, quote and LF).

    Only LEXICALLY VALID integers abbreviate: an ill-formed typed
    literal (legal RDF, e.g. "abc"^^xsd:integer) keeps the quoted typed
    form — a bare ill-formed lex would be unparseable or, worse, break
    the column framing (found by the hypothesis round-trip property)."""
    import re

    if (t.kind == KIND_LITERAL and t.dt == "integer"
            and re.fullmatch(r"[+-]?\d+", t.lex)):
        return t.lex
    return t.n3().replace("\t", "\\t").replace("\r", "\\r")


def to_sparql_tsv(df: DataFrame) -> str:
    """text/tab-separated-values (SPARQLTSV.swift:11-153): terms in
    Turtle/N-Triples syntax, unbound empty."""
    cols = [c for c in df.columns if not c.startswith("__")]
    lines = ["\t".join("?" + c for c in cols)]
    for row in _rows(df):
        lines.append("\t".join(
            "" if row[c] is None else _tsv_term(row[c]) for c in cols))
    return "\n".join(lines) + "\n"


def to_sparql_csv(df: DataFrame) -> str:
    """text/csv per SPARQL 1.1 results CSV: plain lexical values —
    IRIs and literals lose their type markers by design; blank nodes
    keep the ``_:label`` form (csv-tsv-res spec §3)."""
    import csv

    cols = [c for c in df.columns if not c.startswith("__")]
    out = io.StringIO()
    w = csv.writer(out, lineterminator="\n")
    w.writerow(cols)
    for row in _rows(df):
        cells = []
        for c in cols:
            t = row[c]
            if t is None:
                cells.append("")
            elif t.kind == KIND_BLANK:
                cells.append("_:" + t.lex)
            elif t.kind == KIND_QUOTED:
                cells.append(t.n3())
            else:
                cells.append(t.lex)
        w.writerow(cells)
    return out.getvalue()


# -- result parsers (the read side of the csv-tsv-res family) ---------------

_TSV_UNESC = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\",
              "'": "'", "b": "\b", "f": "\f"}


def _parse_tsv_cell(cell: str) -> PyTerm | None:
    """One TSV cell → PyTerm (None = unbound). Accepts the N-Triples
    term forms the spec allows plus the bare numeric/boolean
    abbreviations (SPARQLTSVParser, SPARQLTSV.swift:11-153)."""
    import re

    if cell == "":
        return None
    if cell.startswith("<<"):
        # RDF-star quoted triple << s p o >> — must dispatch BEFORE the
        # IRI branch: '<< <s> <p> <o> >>' also starts with '<' and ends
        # with '>' and previously parsed as a malformed IRI (r9 ADVICE)
        t, pos = _parse_n3_term(cell, 0)
        if cell[pos:].strip():
            raise ValueError(f"trailing content after quoted triple: {cell!r}")
        return t
    if cell.startswith("<") and cell.endswith(">"):
        return PyTerm(KIND_IRI, cell[1:-1])
    if cell.startswith("_:"):
        return PyTerm(KIND_BLANK, cell[2:])
    if cell.startswith('"'):
        # scan to the closing quote, honoring backslash escapes
        out, i = [], 1
        while i < len(cell):
            ch = cell[i]
            if ch == "\\" and i + 1 < len(cell):
                nxt = cell[i + 1]
                if nxt == "u" and i + 5 < len(cell):
                    out.append(chr(int(cell[i + 2:i + 6], 16)))
                    i += 6
                    continue
                if nxt == "U" and i + 9 < len(cell):
                    out.append(chr(int(cell[i + 2:i + 10], 16)))
                    i += 10
                    continue
                out.append(_TSV_UNESC.get(nxt, nxt))
                i += 2
                continue
            if ch == '"':
                break
            out.append(ch)
            i += 1
        lex, rest = "".join(out), cell[i + 1:]
        if rest.startswith("@"):
            return PyTerm(KIND_LITERAL, lex, "langString", rest[1:])
        if rest.startswith("^^<") and rest.endswith(">"):
            dt_iri = rest[3:-1]
            return PyTerm(KIND_LITERAL, lex, IRI_DT.get(dt_iri, dt_iri))
        return PyTerm(KIND_LITERAL, lex, "string")
    if cell in ("true", "false"):
        return PyTerm(KIND_LITERAL, cell, "boolean")
    if re.fullmatch(r"[+-]?\d+", cell):
        return PyTerm(KIND_LITERAL, cell, "integer")
    if re.fullmatch(r"[+-]?\d*\.\d+", cell):
        return PyTerm(KIND_LITERAL, cell, "decimal")
    if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+", cell):
        return PyTerm(KIND_LITERAL, cell, "double")
    raise ValueError(f"unparseable TSV term: {cell!r}")


def _parse_n3_term(s: str, i: int) -> "tuple[PyTerm, int]":
    """Recursive-descent term parse inside a TSV cell, returning
    (term, next_pos). Needed only because quoted triples nest: the
    component terms of ``<< s p o >>`` are delimited by structure, not
    by the cell boundary. Leaf terms re-use _parse_tsv_cell on the
    scanned slice so escape/abbreviation handling stays in one place."""
    from kineo_spark.model import quoted

    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    if s.startswith("<<", i):
        i += 2
        sub, i = _parse_n3_term(s, i)
        prd, i = _parse_n3_term(s, i)
        obj, i = _parse_n3_term(s, i)
        while i < n and s[i].isspace():
            i += 1
        if not s.startswith(">>", i):
            raise ValueError(f"unterminated quoted triple: {s!r}")
        return quoted(sub, prd, obj), i + 2
    start = i
    if s.startswith("<", i):
        j = s.index(">", i)  # IRIREF cannot contain '>'
        return PyTerm(KIND_IRI, s[i + 1:j]), j + 1
    if s.startswith('"', i):
        j = i + 1
        while j < n and s[j] != '"':
            j += 2 if s[j] == "\\" else 1
        j += 1  # past the closing quote
        if s.startswith("@", j):
            while j < n and (s[j].isalnum() or s[j] in "@-"):
                j += 1
        elif s.startswith("^^<", j):
            j = s.index(">", j) + 1
        t = _parse_tsv_cell(s[start:j])
        assert t is not None
        return t, j
    # blank node or bare numeric/boolean: runs to whitespace or '>'
    j = i
    while j < n and not s[j].isspace() and s[j] != ">":
        j += 1
    t = _parse_tsv_cell(s[i:j])
    if t is None:
        raise ValueError(f"empty term at {i} in {s!r}")
    return t, j


def from_sparql_tsv(text: str) -> tuple[list[str], list[dict]]:
    """Parse text/tab-separated-values results: (variables, rows) with
    rows as var→PyTerm dicts (unbound vars absent)."""
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    header = [h[1:] if h.startswith("?") else h
              for h in lines[0].split("\t")] if lines else []
    rows = []
    for line in lines[1:]:
        cells = line.split("\t")
        row = {}
        for var, cell in zip(header, cells):
            t = _parse_tsv_cell(cell)
            if t is not None:
                row[var] = t
        rows.append(row)
    return header, rows


def from_sparql_csv(text: str) -> tuple[list[str], list[dict]]:
    """Parse text/csv results: (variables, rows) with rows as
    var→string dicts. CSV is lossy by design (no type markers; unbound
    and empty string are both the empty cell — kept as absent)."""
    import csv

    rdr = csv.reader(io.StringIO(text))
    table = list(rdr)
    header = table[0] if table else []
    rows = []
    for cells in table[1:]:
        rows.append({var: cell for var, cell in zip(header, cells)
                     if cell != ""})
    return header, rows


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
