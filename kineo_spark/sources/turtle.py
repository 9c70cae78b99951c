"""Turtle / TriG parser (driver-side) and Turtle serializer.

Reference: Turtle via the serd C library (RDF/SerdParser.swift:175-330)
and the prefix-grouping Turtle serializer (RDF/Turtle.swift:147-311).

Scope: the common Turtle subset — @prefix/@base (and SPARQL-style
PREFIX/BASE), prefixed names, 'a', predicate-object lists (';'), object
lists (','), typed/lang literals, blank nodes ([] and _:), collections
( ... ), numeric/boolean shorthand; TriG graph blocks. Parsing happens
on the driver (Turtle is context-sensitive — not line-parallel like
N-Triples, which remains the bulk-load format; the reference makes the
same tradeoff by linking a C parser); the resulting quads DataFrame is
distributed as usual.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from kineo_spark.model import IRI_DT, KIND_BLANK, KIND_IRI, KIND_LITERAL, NUMERIC_DTS, QUADS_SCHEMA, RDF_NS

# NUM follows the Turtle grammar exactly: DOUBLE has an exponent,
# DECIMAL requires digits after the point, so "1." lexes as the integer
# 1 followed by the '.' statement terminator (not as a number).
# PNAME local parts may contain dots but cannot END with one, so a
# trailing '.' after a prefixed name is always the statement terminator.
# Name character classes are the full Unicode PN_CHARS ranges (shared
# with the SPARQL tokenizer) — ex:名前, ex:café etc. parse.
from kineo_spark.sparql_parser import _PNB, _PNC, _PNU  # noqa: E402

_TOKEN = re.compile(
    rf"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>]*>)
    | (?P<STRING>'''(?:.|\n)*?'''|\"\"\"(?:.|\n)*?\"\"\"|'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<NUM>[+-]?(?:(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+|\d*\.\d+|\d+))
    | (?P<BNODE>_:[{_PNU}0-9][{_PNC}.]*(?<!\.)|_:[{_PNU}0-9])
    | (?P<PNAME>[{_PNU}][{_PNC}.]*?:(?:(?:[{_PNC}.:%]|\\[_~.\-!$&'()*+,;=/?\#@%])*(?:[{_PNC}:%]|\\[_~.\-!$&'()*+,;=/?\#@%]))?|:(?:(?:[{_PNC}.%]|\\[_~.\-!$&'()*+,;=/?\#@%])*(?:[{_PNC}%]|\\[_~.\-!$&'()*+,;=/?\#@%]))?)
    | (?P<KW>@?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<OP>\^\^|[{{}}()\[\].,;])
    """,
    re.VERBOSE,
)

# single-pass string unescape: unicode_escape is WRONG here (it
# reinterprets UTF-8 text as Latin-1, corrupting any non-ASCII literal
# that also contains an escape). One regex pass, left to right.
_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.DOTALL)
_ESC_MAP = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape_str(s: str) -> str:
    def rep(m):
        g = m.group(1)
        if g[0] in "uU":
            return chr(int(g[1:], 16))
        return _ESC_MAP.get(g, g)
    return _ESC_RE.sub(rep, s)


_RDF_FIRST = RDF_NS + "first"
_RDF_REST = RDF_NS + "rest"
_RDF_NIL = RDF_NS + "nil"
_RDF_TYPE = RDF_NS + "type"


class _Term(tuple):
    """(kind, lex, dt, lang)."""


def _mk(kind, lex, dt=None, lang=None):
    return (kind, lex, dt, lang)


class TurtleParser:
    def __init__(self, text: str, default_graph: str = "urn:g:default", base: str = "",
                 prefixes: dict[str, str] | None = None, anon_prefix: str = ""):
        self.toks = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise SyntaxError(f"turtle: cannot tokenize at {text[pos:pos+30]!r}")
            pos = m.end()
            if m.lastgroup != "WS":
                self.toks.append((m.lastgroup, m.group()))
        self.toks.append(("EOF", ""))
        self.i = 0
        self.prefixes: dict[str, str] = dict(prefixes) if prefixes else {}
        self.base = base
        self.quads: list[tuple] = []
        self.graph = default_graph
        self.default_graph = default_graph
        # distributed parse: per-chunk prefix keeps fresh bnode labels
        # globally unique across independently-parsed statement chunks
        self.anon_prefix = anon_prefix
        self._anon = 0

    # token helpers
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def op(self, text):
        if self.peek() == ("OP", text):
            self.next()
            return True
        return False

    def expect(self, text):
        if not self.op(text):
            raise SyntaxError(f"turtle: expected {text!r}, got {self.peek()}")

    # parsing
    def parse(self) -> list[tuple]:
        while self.peek()[0] != "EOF":
            k, v = self.peek()
            if (k == "LANGTAG" and v in ("@prefix", "@base")) or (
                k == "KW" and v.upper() in ("PREFIX", "BASE")
            ):
                self._directive()
            elif k in ("IRI", "PNAME", "BNODE") and self.toks[self.i + 1] == ("OP", "{"):
                # TriG graph block
                g = self._resolve_node(self.next())
                self.expect("{")
                old, self.graph = self.graph, g[1]
                while not self.op("}"):
                    self._triples()
                    self.op(".")
                self.graph = old
            else:
                self._triples()
                self.expect(".")
        return self.quads

    def _directive(self):
        k, v = self.next()
        word = v.lstrip("@").upper()
        if word == "PREFIX":
            pk, pv = self.next()
            pfx = pv[:-1] if pv.endswith(":") else pv.split(":")[0]
            ik, iv = self.next()
            self.prefixes[pfx] = iv[1:-1]
        else:
            ik, iv = self.next()
            self.base = iv[1:-1]
        if self.peek() == ("OP", "."):
            self.next()

    def _resolve_node(self, tok):
        k, v = tok
        if k == "IRI":
            val = v[1:-1]
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", val):
                from urllib.parse import urljoin
                val = urljoin(self.base, val)
            return _mk(KIND_IRI, val)
        if k == "PNAME":
            pfx, _, local = v.partition(":")
            ns = self.prefixes.get(pfx)
            if ns is None:
                raise SyntaxError(f"turtle: unknown prefix {pfx}:")
            # PN_LOCAL_ESC: backslash-escaped punctuation is literal
            local = re.sub(r"\\(.)", r"\1", local)
            return _mk(KIND_IRI, ns + local)
        if k == "BNODE":
            return _mk(KIND_BLANK, v[2:])
        raise SyntaxError(f"turtle: unexpected {tok}")

    def _fresh_bnode(self):
        self._anon += 1
        return _mk(KIND_BLANK, f"genid{self.anon_prefix}{self._anon}")

    def _subject(self):
        k, v = self.peek()
        if k == "OP" and v == "[":
            return self._blank_node_property_list()
        if k == "OP" and v == "(":
            return self._collection()
        return self._resolve_node(self.next())

    def _object(self):
        k, v = self.peek()
        if k == "OP" and v == "[":
            return self._blank_node_property_list()
        if k == "OP" and v == "(":
            return self._collection()
        if k == "STRING":
            self.next()
            raw = v[3:-3] if v.startswith(("'''", '"""')) else v[1:-1]
            raw = _unescape_str(raw) if "\\" in raw else raw
            nk, nv = self.peek()
            if (nk, nv) == ("OP", "^^"):
                self.next()
                dt = self._resolve_node(self.next())
                tok = IRI_DT.get(dt[1], dt[1])
                return _mk(KIND_LITERAL, raw, tok)
            if nk == "LANGTAG":
                self.next()
                return _mk(KIND_LITERAL, raw, "langString", nv[1:])
            return _mk(KIND_LITERAL, raw, "string")
        if k == "NUM":
            self.next()
            if re.match(r"^[+-]?\d+$", v):
                return _mk(KIND_LITERAL, v, "integer")
            if "e" in v.lower():
                return _mk(KIND_LITERAL, v, "double")
            return _mk(KIND_LITERAL, v, "decimal")
        if k == "KW" and v in ("true", "false"):
            self.next()
            return _mk(KIND_LITERAL, v, "boolean")
        return self._resolve_node(self.next())

    def _predicate(self):
        k, v = self.peek()
        if k == "KW" and v == "a":
            self.next()
            return _mk(KIND_IRI, _RDF_TYPE)
        return self._resolve_node(self.next())

    def _emit(self, s, p, o):
        from kineo_spark.model import lexical_num

        num = lexical_num(o[1], o[2]) if o[0] == KIND_LITERAL else None
        self.quads.append(
            (s[0], s[1], p[1], o[0], o[1],
             o[2] if o[0] == KIND_LITERAL else None,
             o[3] if o[0] == KIND_LITERAL else None,
             num, self.graph)
        )

    def _predicate_object_list(self, subj):
        while True:
            p = self._predicate()
            while True:
                o = self._object()
                self._emit(subj, p, o)
                if not self.op(","):
                    break
            if not self.op(";"):
                break
            if self.peek()[0] == "OP" and self.peek()[1] in (".", "]", "}"):
                break

    def _blank_node_property_list(self):
        self.expect("[")
        node = self._fresh_bnode()
        if not self.op("]"):
            self._predicate_object_list(node)
            self.expect("]")
        return node

    def _collection(self):
        self.expect("(")
        items = []
        while not self.op(")"):
            items.append(self._object())
        if not items:
            return _mk(KIND_IRI, _RDF_NIL)
        nodes = [self._fresh_bnode() for _ in items]
        for i, (n, item) in enumerate(zip(nodes, items)):
            self._emit(n, _mk(KIND_IRI, _RDF_FIRST), item)
            rest = nodes[i + 1] if i + 1 < len(nodes) else _mk(KIND_IRI, _RDF_NIL)
            self._emit(n, _mk(KIND_IRI, _RDF_REST), rest)
        return nodes[0]

    def _triples(self):
        subj = self._subject()
        self._predicate_object_list(subj)


def load_turtle(
    spark: SparkSession, path_or_text: str, default_graph: str = "urn:g:default",
    base: str = "",
) -> DataFrame:
    """Parse a Turtle/TriG file (or literal text) into a flat quads
    DataFrame."""
    import os

    text = path_or_text
    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            text = fh.read()
    quads = TurtleParser(text, default_graph, base=base).parse()
    return spark.createDataFrame(quads, QUADS_SCHEMA)


# ---------------------------------------------------------------------------
# Distributed Turtle subset (statement-parallel, like ntriples.py)
# ---------------------------------------------------------------------------
#
# Turtle is context-sensitive in exactly two ways that block naive line
# parallelism: the prefix table, and statements spanning lines. The
# distributed path handles both for the common subset:
#   * all @prefix/@base directives sit in the file header (parsed on the
#     driver once, broadcast to executors);
#   * no triple-quoted (multi-line) strings and no TriG graph blocks —
#     then every statement terminator '.' falls at a line end, so lines
#     group into statements by a quote/IRI-aware per-line scan plus a
#     per-partition running count (no global window, no driver loop).
# Files outside the subset fall back to the driver-side full parser with
# identical results. At 100 TB the flow is: one scan pass for
# per-partition statement counts (collects #partitions ints), one pass
# assigning statement ids, one shuffle on stmt_id to reassemble
# multi-line statements, then an Arrow-batched parse of each statement
# chunk. Skew-free: a statement is almost always a single line.

_DIRECTIVE_RE = re.compile(r"^\s*(?:@prefix|@base|PREFIX|BASE)\b", re.IGNORECASE)


def _scan_line(line: str) -> tuple[bool, str | None]:
    """Scan one physical line outside any cross-line state. Returns
    (ends_statement, unsupported_reason). ends_statement is True iff the
    last significant character (outside strings/IRIs/comments) is '.'."""
    i, n = 0, len(line)
    last = ""
    while i < n:
        ch = line[i]
        if ch == "\\" and i + 1 < n:
            i += 2  # PN_LOCAL escape: next char is literal
            last = line[i - 1]
            continue
        if ch == "#":
            break  # comment to end of line
        if ch in "'\"":
            if line[i:i + 3] in ("'''", '"""'):
                return (False, "triple-quoted string")
            j = i + 1
            while j < n:
                if line[j] == "\\":
                    j += 2
                    continue
                if line[j] == ch:
                    break
                j += 1
            else:
                return (False, "unterminated string (multi-line?)")
            if j >= n:
                return (False, "unterminated string (multi-line?)")
            i = j + 1
            last = ch
            continue
        if ch == "<":
            j = line.find(">", i + 1)
            if j < 0:
                return (False, "unterminated IRI")
            i = j + 1
            last = ">"
            continue
        if ch in "{}":
            return (False, "TriG graph block")
        if not ch.isspace():
            last = ch
        i += 1
    return (last == ".", None)


def _header_file(path: str) -> str:
    """The file whose head carries the prologue: the path itself, or the
    lexicographically first file of a directory input (sc.textFile
    reads directory parts in that order)."""
    import os

    if not os.path.isdir(path):
        return path
    names = sorted(
        n for n in os.listdir(path)
        if not n.startswith((".", "_")) and os.path.isfile(os.path.join(path, n))
    )
    if not names:
        raise FileNotFoundError(f"no files in {path}")
    return os.path.join(path, names[0])


def _read_header(path: str) -> tuple[dict[str, str], str, int]:
    """Driver-side: consume leading directive lines (plus blanks and
    comments). Returns (prefixes, base, n_header_lines)."""
    prefixes: dict[str, str] = {}
    base = ""
    n_header = 0
    with open(_header_file(path)) as fh:
        for line in fh:
            stripped = line.strip()
            if stripped and not stripped.startswith("#"):
                if not _DIRECTIVE_RE.match(stripped):
                    break
                p = TurtleParser(stripped, base=base, prefixes=prefixes)
                p.parse()
                prefixes.update(p.prefixes)
                base = p.base or base
            n_header += 1
    return prefixes, base, n_header


def load_turtle_distributed(
    spark: SparkSession, path: str, default_graph: str = "urn:g:default",
    base: str = "",
) -> DataFrame:
    """Statement-parallel Turtle load for the header-directives subset;
    transparently falls back to the driver-side parser otherwise."""
    import pandas as pd
    from pyspark.sql import functions as F

    prefixes, base, n_header = _read_header(path)

    # Pass 1: per-line scan; per-partition statement-end counts.
    lines = spark.sparkContext.textFile(path)  # partition order = file order
    body = (
        lines.zipWithIndex()
        .filter(lambda t: t[1] >= n_header)
        .map(lambda t: (t[1], t[0], _scan_line(t[0])))
    )
    body = body.cache()

    def part_stats(pid, it):
        ends = 0
        bad = None
        for _, line, (e, reason) in it:
            if reason and bad is None:
                bad = reason
            if _DIRECTIVE_RE.match(line) and bad is None:
                bad = "mid-file directive"
            ends += 1 if e else 0
        yield (pid, ends, bad)

    stats = sorted(body.mapPartitionsWithIndex(part_stats).collect())
    reasons = [b for _, _, b in stats if b]
    if reasons:
        body.unpersist()
        # outside the distributed subset: full-grammar driver-side parse
        import os

        if os.path.isdir(path):
            text = "".join(
                open(os.path.join(path, n)).read()
                for n in sorted(os.listdir(path))
                if not n.startswith((".", "_"))
                and os.path.isfile(os.path.join(path, n))
            )
            return load_turtle(spark, text, default_graph, base=base)
        return load_turtle(spark, path, default_graph, base=base)

    offsets = {}
    acc = 0
    for pid, ends, _ in stats:
        offsets[pid] = acc
        acc += ends

    # Pass 2: assign statement ids (count of statement-ends before the line).
    def assign(pid, it):
        sid = offsets[pid]
        for idx, line, (e, _) in it:
            yield (sid, idx, line)
            if e:
                sid += 1

    parts_df = spark.createDataFrame(
        body.mapPartitionsWithIndex(assign), "stmt_id long, idx long, line string"
    )
    body.unpersist()

    # Reassemble multi-line statements: one shuffle on stmt_id.
    stmts = parts_df.groupBy("stmt_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))), lambda s: s["line"]
            ),
            "\n",
        ).alias("text")
    )

    out_schema = QUADS_SCHEMA

    def parse_chunk(batches):
        for pdf in batches:
            rows = []
            for sid, text in zip(pdf["stmt_id"], pdf["text"]):
                if not text.strip():
                    continue
                p = TurtleParser(
                    text, default_graph, base=base, prefixes=prefixes,
                    anon_prefix=f"s{sid}_",
                )
                rows.extend(p.parse())
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return stmts.mapInPandas(parse_chunk, schema=out_schema)


def serialize_turtle(quads: DataFrame, prefixes: dict[str, str] | None = None) -> str:
    """Turtle text with prefix grouping (driver-side; Turtle.swift:147-311)."""
    from kineo_spark.model import DT_IRI, PyTerm

    prefixes = prefixes or {}
    inv = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def shorten(iri_str: str) -> str:
        for pfx, ns in inv:
            if iri_str.startswith(ns):
                local = iri_str[len(ns):]
                if re.match(r"^[A-Za-z0-9_.-]*$", local):
                    return f"{pfx}:{local}"
        return f"<{iri_str}>"

    def term_str(kind, lex, dt=None, lang=None):
        if kind == KIND_IRI:
            return shorten(lex)
        if kind == KIND_BLANK:
            return f"_:{lex}"
        return PyTerm(kind, lex, dt, lang).n3()

    lines = [f"@prefix {p}: <{ns}> ." for p, ns in prefixes.items()]
    if lines:
        lines.append("")
    # group by subject (driver-side; result serialization is human-scale)
    rows = quads.collect()
    by_subj: dict[tuple, list] = {}
    for r in rows:
        by_subj.setdefault((r.s_kind, r.s_lex), []).append(r)
    for (sk, sl), grp in sorted(by_subj.items(), key=lambda kv: kv[0][1]):
        subj = term_str(sk, sl)
        po = " ;\n    ".join(
            f"{shorten(r.p_lex)} {term_str(r.o_kind, r.o_lex, r.o_dt, r.o_lang)}"
            for r in sorted(grp, key=lambda r: (r.p_lex, r.o_lex))
        )
        lines.append(f"{subj} {po} .")
    return "\n".join(lines) + "\n"
