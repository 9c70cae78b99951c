"""SPARQL 1.1 text → algebra parser (recursive descent).

The reference delegates parsing to the external swift-sparql-syntax
package (Package.swift:19) and consumes its algebra; this module plays
that role for our engine: SPARQL text in, kineo_spark.algebra out,
ready for the compiler. Covers the query subset exercised by the
reference's tests (SURVEY §5): SELECT/ASK/CONSTRUCT/DESCRIBE, BGPs,
OPTIONAL/UNION/MINUS/GRAPH/FILTER/BIND/VALUES, subselects, property
paths, aggregates + GROUP BY/HAVING, ORDER/LIMIT/OFFSET/DISTINCT/
REDUCED, EXISTS/NOT EXISTS, and the §2.9 builtin function surface.
"""

from __future__ import annotations

import re

from kineo_spark import algebra as A
from kineo_spark.expr import ECall, EConst, EExists, EVar, Expr, fn as mkfn
from kineo_spark.model import DT_IRI, IRI_DT, PyTerm, blank, iri, lit

# SPARQL 1.1 grammar [164] PN_CHARS_BASE: names and variables admit
# the full Unicode identifier ranges (non-ASCII names, e.g. Japanese
# or accented prefixed names and variables).
_PNB = ("A-Za-z"
        "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF"
        "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D"
        "\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
        "\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF")
_PNU = _PNB + "_"                       # [165] PN_CHARS_U
_PNC = _PNU + "0-9\\-\u00B7\u0300-\u036F\u203F-\u2040"  # [167] PN_CHARS
# [166] VARNAME: like PN_CHARS but WITHOUT the hyphen — ?v-18 is
# the variable ?v minus 18, not a variable named "v-18"
_VARC = _PNU + "0-9\u00B7\u0300-\u036F\u203F-\u2040"

_TOKEN_RE = re.compile(
    rf"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>\s]*>)
    | (?P<STRING>'''(?:.|\n)*?'''|\"\"\"(?:.|\n)*?\"\"\"|'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<VAR>[?$][{_PNU}0-9][{_VARC}]*)
    | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<NUM>[+-]?(?:(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+|\d*\.\d+|\d+))
    | (?P<BNODE>_:[{_PNU}0-9][{_PNC}]*)
    | (?P<PNAME>(?:[{_PNB}][{_PNC}.]*)?:(?:(?:[{_PNC}.:%]|\\[_~.\-!$&'()*+,;=/?\#@%])*(?:[{_PNC}:%]|\\[_~.\-!$&'()*+,;=/?\#@%]))?)
    | (?P<KW>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{{}}()\[\].,;*+?/|^!<>=-])
    """,
    re.VERBOSE,
)

def _u_decode(s: str) -> str:
    r"""Codepoint escapes only (\uXXXX / \UXXXXXXXX) — IRIs admit these
    but not ECHARs."""
    def rep(m):
        return chr(int(m.group(1)[1:], 16))
    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})", rep, s)


_ESC = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
        '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    """SPARQL string escapes: ECHAR ([159]) plus \\uXXXX / \\UXXXXXXXX
    codepoint escapes ([36] in the grammar's codepoint-escape note)."""
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
            out.append(_ESC.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class Token:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}:{self.text}"


def tokenize(s: str) -> list[Token]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise SyntaxError(f"cannot tokenize at: {s[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        toks.append(Token(kind, m.group()))
    toks.append(Token("EOF", ""))
    return toks


_BUILTINS = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI", "BNODE",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE",
    "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1", "SHA256",
    "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT", "SAMETERM",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "REGEX", "SUBSTR",
    "REPLACE",
    # SPARQL-star builtins (RDF-star extension)
    "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ISTRIPLE",
}
_AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._anon = 0
        self._aggs: list[tuple[str, A.AggSpec]] = []
        # triples produced by blank-node property lists / collections,
        # collected by the enclosing triples block
        self._pending: list[A.TriplePattern] = []
        self._pending_paths: list[A.PathPattern] = []
        # RDF-star: bind/filter constraints desugared from quoted triple
        # patterns (<< s p o >> with variables), applied by the
        # enclosing triples block
        self._star_pending: list[tuple] = []
        self._qt_anon = 0
        # RDF-star in TEMPLATE position (CONSTRUCT / update quad
        # templates): << .. ?v .. >> means CONSTRUCT the quoted term per
        # solution, not decompose — each becomes a fresh var extended
        # onto the WHERE algebra with TRIPLE(...)
        self._template_extends: list[tuple] = []
        # FROM / FROM NAMED clauses of the top-level query form
        self._dataset: tuple = ()
        # inside a CONSTRUCT template, bnodes stay constants (instantiated
        # fresh per solution); in patterns they are non-distinguished vars
        self._in_template = False

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t.kind == "KW" and t.text.upper() == word:
            self.next()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.kw(word):
            raise SyntaxError(f"expected {word}, got {self.peek()}")

    def op(self, text: str) -> bool:
        t = self.peek()
        if t.kind == "OP" and t.text == text:
            self.next()
            return True
        return False

    def expect_op(self, text: str):
        if not self.op(text):
            raise SyntaxError(f"expected {text!r}, got {self.peek()}")

    # -- entry ------------------------------------------------------------
    def parse_query(self):
        self._prologue()
        t = self.peek()
        word = t.text.upper() if t.kind == "KW" else ""
        if word == "SELECT":
            form = self._select_query(top=True)
        elif word == "ASK":
            self.next()
            form = A.AskQuery(self._where_and_modifiers_simple(),
                              dataset=self._dataset)
        elif word == "CONSTRUCT":
            form = self._construct_query()
        elif word == "DESCRIBE":
            form = self._describe_query()
        else:
            raise SyntaxError(f"expected query form, got {t}")
        # grammar [1]: Query ::= Prologue (...Query) ValuesClause —
        # the final VALUES joins the WHERE pattern (§18.2.4.6). SELECT
        # consumes its own (grammar [8] SubSelect shares the clause).
        if self.kw("VALUES"):
            import dataclasses

            form = dataclasses.replace(
                form, algebra=A.Join(form.algebra, self._values_clause()))
        if self.peek().kind != "EOF":
            raise SyntaxError(f"unexpected trailing tokens: {self.peek()}")
        return form

    def _prologue(self):
        while True:
            if self.kw("PREFIX"):
                pname = self.next()
                iri_t = self.next()
                self.prefixes[pname.text[:-1] if pname.text.endswith(":") else pname.text.split(":")[0]] = iri_t.text[1:-1]
            elif self.kw("BASE"):
                self.base = self.next().text[1:-1]
            else:
                break

    # -- terms ------------------------------------------------------------
    def _resolve_pname(self, text: str) -> PyTerm:
        pfx, _, local = text.partition(":")
        ns = self.prefixes.get(pfx)
        if ns is None:
            raise SyntaxError(f"unknown prefix {pfx}:")
        # PN_LOCAL_ESC ([173]): backslash-escaped punctuation is literal
        local = re.sub(r"\\(.)", r"\1", local)
        return iri(ns + local)

    def _term(self) -> PyTerm:
        t = self.next()
        if t.kind == "IRI":
            val = _u_decode(t.text[1:-1])
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", val):
                from urllib.parse import urljoin
                val = urljoin(self.base, val)
            return iri(val)
        if t.kind == "PNAME":
            return self._resolve_pname(t.text)
        if t.kind == "BNODE":
            return blank(t.text[2:])
        if t.kind == "NUM":
            return self._num_literal(t.text)
        if t.kind == "STRING":
            raw = t.text
            if raw.startswith(("'''", '"""')):
                val = raw[3:-3]
            else:
                val = _unescape(raw[1:-1])
            nxt = self.peek()
            if nxt.kind == "OP" and nxt.text == "^^":
                self.next()
                dt_term = self._term()
                tok = IRI_DT.get(dt_term.lex, dt_term.lex)
                return PyTerm(2, val, tok)
            if nxt.kind == "LANGTAG":
                self.next()
                return PyTerm(2, val, "langString", nxt.text[1:])
            return lit(val)
        if t.kind == "KW" and t.text.lower() in ("true", "false"):
            return lit(t.text.lower() == "true")
        if t.kind == "KW" and t.text == "a":
            from kineo_spark.store import RDF_TYPE
            return iri(RDF_TYPE)
        raise SyntaxError(f"expected term, got {t}")

    def _num_literal(self, txt: str) -> PyTerm:
        if re.match(r"^[+-]?\d+$", txt):
            return lit(int(txt))
        if "e" in txt.lower():
            return PyTerm(2, txt, "double")
        return PyTerm(2, txt, "decimal")

    def _fresh_bn(self) -> A.Var:
        # 'bn-…' cannot collide with user variables: '-' is not legal in
        # a SPARQL VARNAME. SELECT * drops these (forms.select_plan).
        self._anon += 1
        return A.Var(f"bn-a{self._anon}")

    def _quoted_pattern(self):
        """RDF-star << s p o >> in subject/object position. All-constant
        forms return a quoted PyTerm constant; forms with variables (or
        nested patterns) desugar to a fresh ?qt var plus
        ISTRIPLE/SUBJECT/PREDICATE/OBJECT constraints collected in
        self._star_pending for the enclosing triples block — OUTER
        constraints precede the components' own (a nested pattern's qt
        var must be bound by the outer accessor before its constraints
        read it)."""
        self.next(); self.next()  # the two '<' tokens
        mark = len(self._star_pending)
        s = self._node()
        tp = self.peek()
        if tp.kind == "VAR":
            self.next()
            p = A.Var(tp.text[1:])
        else:
            p = self._term()
        o = self._node()
        self.expect_op(">")
        self.expect_op(">")
        from kineo_spark.model import KIND_LITERAL

        if isinstance(s, PyTerm) and s.kind == KIND_LITERAL:
            # RDF-star grammar: a quoted subject is iri | bnode | quoted
            raise SyntaxError(
                "a literal cannot be the subject of a quoted triple")
        inner = self._star_pending[mark:]
        del self._star_pending[mark:]
        if self._in_template:
            return self._template_quoted_node(s, p, o)
        return self._quoted_node(s, p, o, inner)

    def _template_quoted_node(self, s, p, o):
        """Quoted triple in TEMPLATE position: constants stay a quoted
        PyTerm; with variables, register a fresh var the caller extends
        onto the WHERE algebra as TRIPLE(s, p, o) — so CONSTRUCT
        instantiation just reads a column."""
        from kineo_spark.model import quoted

        if (isinstance(s, PyTerm) and isinstance(p, PyTerm)
                and isinstance(o, PyTerm)):
            return quoted(s, p, o)

        def arg(n):
            return EConst(n) if isinstance(n, PyTerm) else EVar(n.name)

        self._qt_anon += 1
        name = f"qtt-{self._qt_anon}"
        self._template_extends.append(
            (name, mkfn("TRIPLE", arg(s), arg(p), arg(o))))
        return A.Var(name)

    def _apply_template_extends(self, body):
        """Wrap the WHERE algebra with the TRIPLE() extends registered
        while parsing quoted template nodes (inner before outer — an
        outer quoted term references its nested var)."""
        ext, self._template_extends = self._template_extends, []
        for name, e in ext:
            body = A.Extend(body, e, name)
        return body

    def _quoted_node(self, s, p, o, inner: list):
        """Desugar a quoted triple over already-parsed component nodes.
        All-constant forms return a quoted PyTerm constant; otherwise a
        fresh ?qt var plus ISTRIPLE/accessor constraints go to
        self._star_pending, OUTER before ``inner`` (a nested pattern's qt
        var must be bound by the outer accessor before its constraints
        read it)."""
        from kineo_spark.model import quoted

        if (isinstance(s, PyTerm) and isinstance(p, PyTerm)
                and isinstance(o, PyTerm)):
            return quoted(s, p, o)
        self._qt_anon += 1
        qt = f"qt-{self._qt_anon}"
        own: list[tuple] = [("filter", mkfn("ISTRIPLE", EVar(qt)))]
        for comp, acc in ((s, "SUBJECT"), (p, "PREDICATE"), (o, "OBJECT")):
            e = mkfn(acc, EVar(qt))
            if isinstance(comp, PyTerm):
                own.append(("filter", mkfn("SAMETERM", e, comp)))
            else:
                own.append(("bind", comp.name, e))
        self._star_pending.extend(own)
        self._star_pending.extend(inner)
        return A.Var(qt)

    def _annotation(self, s, p, o, triples: list) -> None:
        """SPARQL-star annotation block(s) ``t {| p1 o1 ; ... |}`` after a
        triple: sugar for << s p o >> as the subject of the annotation
        property list (the base triple is already appended by the
        caller). Nested annotations on annotation triples recurse."""
        while (self.peek().kind == "OP" and self.peek().text == "{"
               and self.peek(1).kind == "OP" and self.peek(1).text == "|"):
            self.next(); self.next()
            qt = (self._template_quoted_node(s, p, o) if self._in_template
                  else self._quoted_node(s, p, o, []))
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    pred = A.Var(t.text[1:])
                else:
                    pred = self._term()
                obj = self._node()
                triples.append(A.TriplePattern(qt, pred, obj))
                self._annotation(qt, pred, obj, triples)
                while self.op(","):
                    obj = self._node()
                    triples.append(A.TriplePattern(qt, pred, obj))
                    self._annotation(qt, pred, obj, triples)
                if self.op(";"):
                    if (self.peek().kind == "OP"
                            and self.peek().text in ("|",)):
                        break
                    continue
                break
            self.expect_op("|")
            self.expect_op("}")

    def _node(self):
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return A.Var(t.text[1:])
        if (t.kind == "OP" and t.text == "<" and self.peek(1).kind == "OP"
                and self.peek(1).text == "<"):
            return self._quoted_pattern()
        if t.kind == "BNODE" and not self._in_template:
            # a blank node in a query pattern is a non-distinguished
            # variable (RDF semantics), shared across the group
            self.next()
            return A.Var("bn-" + t.text[2:])
        if t.kind == "OP" and t.text == "[":
            self.next()
            b = self._fresh_bn()
            if self.op("]"):
                return b
            # blank-node property list: [ p1 o1 , o1b ; p2 o2 ] — each
            # verb may be a var, an iri, or a full property path
            while True:
                t2 = self.peek()
                cur_path = None
                if t2.kind == "VAR":
                    pred = A.Var(self.next().text[1:])
                elif (t2.kind in ("IRI", "PNAME")
                      or (t2.kind == "KW" and t2.text == "a")) \
                        and not self._lookahead_path():
                    pred = self._term()
                else:
                    p = self._path()
                    if isinstance(p, PyTerm):
                        pred = p
                    else:
                        cur_path = p
                if cur_path is not None:
                    self._pending_paths.append(
                        A.PathPattern(b, cur_path, self._node()))
                    while self.op(","):
                        self._pending_paths.append(
                            A.PathPattern(b, cur_path, self._node()))
                else:
                    self._pending.append(A.TriplePattern(b, pred, self._node()))
                    while self.op(","):
                        self._pending.append(A.TriplePattern(b, pred, self._node()))
                if self.op(";"):
                    if self.peek().kind == "OP" and self.peek().text == "]":
                        break
                    continue
                break
            self.expect_op("]")
            return b
        if t.kind == "OP" and t.text == "(":
            # collection ( e1 e2 … ) → rdf:first/rdf:rest chain
            from kineo_spark.model import RDF_NS
            self.next()
            items = []
            while not self.op(")"):
                items.append(self._node())
            if not items:
                return iri(RDF_NS + "nil")
            head = cur = self._fresh_bn()
            for k, item in enumerate(items):
                self._pending.append(A.TriplePattern(cur, iri(RDF_NS + "first"), item))
                nxt = self._fresh_bn() if k + 1 < len(items) else iri(RDF_NS + "nil")
                self._pending.append(A.TriplePattern(cur, iri(RDF_NS + "rest"), nxt))
                cur = nxt
            return head
        return self._term()

    # -- property paths ---------------------------------------------------
    def _path(self) -> A.Path | PyTerm:
        p = self._path_alt()
        return p

    def _path_alt(self):
        p = self._path_seq()
        while self.op("|"):
            p = A.PAlt(_as_path(p), _as_path(self._path_seq()))
        return p

    def _path_seq(self):
        p = self._path_elt()
        while self.op("/"):
            p = A.PSeq(_as_path(p), _as_path(self._path_elt()))
        return p

    def _path_elt(self):
        inv = False
        if self.op("^"):
            inv = True
        if self.op("!"):
            # PathNegatedPropertySet ::= PathOneInPropertySet
            #   | '(' (PathOneInPropertySet ('|' PathOneInPropertySet)*)? ')'
            # where PathOneInPropertySet ::= iri | 'a' | '^' (iri|'a').
            # Mixed forward/inverse members decompose per SPARQL 1.1 §9.1:
            # !(p1|..|^q1|..) = alt(nps({p_i}), inv(nps({q_j}))).
            members: list[tuple[bool, object]] = []
            if self.op("("):
                members.append(self._path_one_in_property_set())
                while self.op("|"):
                    members.append(self._path_one_in_property_set())
                self.expect_op(")")
            else:
                members.append(self._path_one_in_property_set())
            fwd = tuple(iri for neg, iri in members if not neg)
            bwd = tuple(iri for neg, iri in members if neg)
            if fwd and bwd:
                p: A.Path = A.PAlt(A.PNps(fwd), A.PInv(A.PNps(bwd)))
            elif bwd:
                p = A.PInv(A.PNps(bwd))
            else:
                p = A.PNps(fwd)
        elif self.op("("):
            p = _as_path(self._path_alt())
            self.expect_op(")")
        else:
            p = self._path_primary_iri()
        # modifiers
        if self.op("+"):
            p = A.PPlus(_as_path(p))
        elif self.op("*"):
            p = A.PStar(_as_path(p))
        elif self.op("?"):
            p = A.PZeroOrOne(_as_path(p))
        if inv:
            p = A.PInv(_as_path(p))
        return p

    def _path_one_in_property_set(self) -> tuple[bool, object]:
        inv = bool(self.op("^"))
        return inv, self._path_primary_iri()

    def _path_primary_iri(self):
        t = self.peek()
        if t.kind in ("IRI", "PNAME") or (t.kind == "KW" and t.text == "a"):
            return self._term()
        raise SyntaxError(f"expected path iri, got {t}")

    # -- expressions ------------------------------------------------------
    def _expression(self) -> Expr:
        return self._or_expr()

    def _or_expr(self) -> Expr:
        e = self._and_expr()
        while self.op("||"):
            e = ECall("||", (e, self._and_expr()))
        return e

    def _and_expr(self) -> Expr:
        e = self._value_logical()
        while self.op("&&"):
            e = ECall("&&", (e, self._value_logical()))
        return e

    def _value_logical(self) -> Expr:
        e = self._numeric_expr()
        t = self.peek()
        if t.kind == "OP" and t.text in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            return ECall(t.text, (e, self._numeric_expr()))
        if t.kind == "KW" and t.text.upper() == "IN":
            self.next()
            return ECall("IN", (e, *self._expr_list()))
        if t.kind == "KW" and t.text.upper() == "NOT":
            if self.peek(1).kind == "KW" and self.peek(1).text.upper() == "IN":
                self.next(); self.next()
                return ECall("NOT_IN", (e, *self._expr_list()))
        return e

    def _expr_list(self) -> list[Expr]:
        self.expect_op("(")
        out = [self._expression()]
        while self.op(","):
            out.append(self._expression())
        self.expect_op(")")
        return out

    def _numeric_expr(self) -> Expr:
        e = self._mul_expr()
        while True:
            if self.op("+"):
                e = ECall("+", (e, self._mul_expr()))
            elif self.op("-"):
                e = ECall("-", (e, self._mul_expr()))
            elif (self.peek().kind == "NUM" and self.peek().text[0] in "+-"):
                # grammar rule [116] AdditiveExpression: a signed numeric
                # literal ('?a+1', '?a-2.5') is an implicit +/- term whose
                # sign binds to the literal: '?v-2*3' = ?v + ((-2)*3).
                t = self.next()
                sign = -1 if t.text[0] == "-" else 1
                rhs: Expr = EConst(self._num_literal(t.text.lstrip("+-")))
                if sign < 0:
                    rhs = ECall("NEG", (rhs,))
                # rule [116]: the signed literal may carry a
                # ('*'|'/' UnaryExpression)* multiplicative tail
                while True:
                    if self.op("*"):
                        rhs = ECall("*", (rhs, self._unary_expr()))
                    elif self.op("/"):
                        rhs = ECall("/", (rhs, self._unary_expr()))
                    else:
                        break
                e = ECall("+", (e, rhs))
            else:
                return e

    def _mul_expr(self) -> Expr:
        e = self._unary_expr()
        while True:
            if self.op("*"):
                e = ECall("*", (e, self._unary_expr()))
            elif self.op("/"):
                e = ECall("/", (e, self._unary_expr()))
            else:
                return e

    def _unary_expr(self) -> Expr:
        if self.op("!"):
            return ECall("!", (self._unary_expr(),))
        if self.op("-"):
            return ECall("NEG", (self._unary_expr(),))
        if self.op("+"):
            return self._unary_expr()
        return self._primary_expr()

    def _primary_expr(self) -> Expr:
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self._expression()
            self.expect_op(")")
            return e
        if t.kind == "VAR":
            self.next()
            return EVar(t.text[1:])
        if t.kind == "KW":
            word = t.text.upper()
            if word == "EXISTS":
                self.next()
                return EExists(self._group_graph_pattern())
            if word == "NOT" and self.peek(1).text.upper() == "EXISTS":
                self.next(); self.next()
                return EExists(self._group_graph_pattern(), anti=True)
            if word in _BUILTINS:
                self.next()
                args: list[Expr] = []
                if self.op("("):
                    if not self.op(")"):
                        args.append(self._expression())
                        while self.op(","):
                            args.append(self._expression())
                        self.expect_op(")")
                op_name = word if word != "URI" else "IRI"
                if op_name == "IRI" and self.base:
                    # §17.4.2.8: IRI(expr) resolves relative references
                    # against the query's base IRI
                    return ECall(op_name, tuple(args),
                                 kwargs=(("base", self.base),))
                return ECall(op_name, tuple(args))
            if word in _AGGS:
                return self._aggregate_expr()
            if t.text.lower() in ("true", "false"):
                self.next()
                return EConst(lit(t.text.lower() == "true"))
        # cast via xsd IRI function call: xsd:integer(?x)
        if t.kind in ("PNAME", "IRI"):
            save = self.i
            term = self._term()
            if self.op("("):
                arg = self._expression()
                self.expect_op(")")
                tok = IRI_DT.get(term.lex)
                if tok is not None:
                    return ECall("CAST", (arg,), (("to", tok),))
                return ECall(term.lex, (arg,))  # extension function by IRI
            self.i = save
        return EConst(self._term())

    def _aggregate_expr(self) -> Expr:
        name = self.next().text.upper()
        self.expect_op("(")
        distinct = self.kw("DISTINCT")
        sep = " "
        if name == "COUNT" and self.op("*"):
            spec = A.AggSpec("COUNT*", None, distinct)
            self.expect_op(")")
        else:
            e = self._expression()
            if name == "GROUP_CONCAT" and self.op(";"):
                self.expect_kw("SEPARATOR")
                self.expect_op("=")
                sep_term = self._term()
                sep = sep_term.lex
            self.expect_op(")")
            # exact decimal accumulation: order-independent results on
            # any partitioning (free determinism; SPARQL allows it)
            spec = A.AggSpec(name, e, distinct, sep, exact=name in ("SUM", "AVG"))
        var = f"agg__{len(self._aggs)}"
        self._aggs.append((var, spec))
        return EVar(var)

    # -- graph patterns ---------------------------------------------------
    def _group_graph_pattern(self) -> A.Algebra:
        self.expect_op("{")
        if self.peek().kind == "KW" and self.peek().text.upper() == "SELECT":
            sub = self._select_query(top=False)
            self.expect_op("}")
            return A.Subquery(sub)
        acc: A.Algebra | None = None
        filters: list[Expr] = []

        def join(x: A.Algebra):
            nonlocal acc
            acc = x if acc is None else A.Join(acc, x)

        while True:
            t = self.peek()
            if t.kind == "OP" and t.text == "}":
                self.next()
                break
            word = t.text.upper() if t.kind == "KW" else ""
            if word == "OPTIONAL":
                self.next()
                rhs = self._group_graph_pattern()
                expr = None
                if isinstance(rhs, A.Filter):
                    rhs, expr = rhs.child, rhs.expr
                acc = A.LeftJoin(acc or A.JoinIdentity(), rhs, expr)
            elif word == "MINUS":
                self.next()
                acc = A.Minus(acc or A.JoinIdentity(), self._group_graph_pattern())
            elif word == "FILTER":
                self.next()
                filters.append(self._expression())
            elif word == "BIND":
                self.next()
                self.expect_op("(")
                e = self._expression()
                self.expect_kw("AS")
                var = self.next()
                self.expect_op(")")
                vname = var.text[1:]
                # §10.1 / grammar note 12: the BIND target must not be
                # already in scope in the group up to this point
                if acc is not None:
                    in_scope: set[str] = set()
                    _scope_vars(acc, in_scope)
                    if vname in in_scope:
                        raise SyntaxError(
                            f"BIND would re-assign in-scope variable ?{vname}")
                acc = A.Extend(acc or A.JoinIdentity(), e, vname)
            elif word == "VALUES":
                self.next()
                join(self._values_clause())
            elif word == "GRAPH":
                self.next()
                gnode = self._node()
                join(A.NamedGraph(gnode, self._group_graph_pattern()))
            elif word == "SERVICE":
                self.next()
                silent = self.kw("SILENT")
                ep = self._term()
                join(A.Service(ep.lex, self._group_graph_pattern(), silent))
            elif t.kind == "OP" and t.text == "{":
                g1 = self._group_graph_pattern()
                if self.peek().kind == "KW" and self.peek().text.upper() == "UNION":
                    while self.kw("UNION"):
                        g1 = A.Union(g1, self._group_graph_pattern())
                join(g1)
            else:
                join(self._triples_block())
            self.op(".")
        out = acc or A.JoinIdentity()
        for f_ in filters:
            if isinstance(f_, EExists):
                out = A.SemiJoin(out, f_.algebra, f_.anti)
            else:
                out = A.Filter(out, f_)
        return out

    def _values_clause(self) -> A.Table:
        if self.op("("):
            vars_ = []
            while not self.op(")"):
                vars_.append(self.next().text[1:])
            rows = []
            self.expect_op("{")
            while self.op("("):
                row = []
                for _ in vars_:
                    if self.kw("UNDEF"):
                        row.append(None)
                    else:
                        row.append(self._term())
                self.expect_op(")")
                rows.append(tuple(row))
            self.expect_op("}")
            return A.Table(tuple(vars_), tuple(rows))
        var = self.next().text[1:]
        rows = []
        self.expect_op("{")
        while not self.op("}"):
            if self.kw("UNDEF"):
                rows.append((None,))
            else:
                rows.append((self._term(),))
        return A.Table((var,), tuple(rows))

    def _triples_block(self) -> A.Algebra:
        """One subject's predicate-object list; returns BGP and/or path
        patterns joined."""
        subj = self._node()
        parts: list[A.Algebra] = []
        triples: list[A.TriplePattern] = []
        while True:
            # path or simple predicate
            t = self.peek()
            if t.kind == "OP" and t.text in ("}", "."):
                # '[ p o ] .' — blankNodePropertyList subject with empty
                # property list is a complete statement
                break
            is_simple = (
                t.kind == "VAR"
                or (t.kind in ("IRI", "PNAME") and self.peek(1).kind not in ()
                    and not self._lookahead_path())
                or (t.kind == "KW" and t.text == "a" and not self._lookahead_path())
            )
            cur_path = None  # set when the current predicate is a path expr
            if t.kind == "VAR":
                pred = A.Var(t.text[1:])
                self.next()
                obj = self._node()
                triples.append(A.TriplePattern(subj, pred, obj))
                self._annotation(subj, pred, obj, triples)
            elif is_simple:
                pred = self._term()
                obj = self._node()
                triples.append(A.TriplePattern(subj, pred, obj))
                self._annotation(subj, pred, obj, triples)
            else:
                path = self._path()
                obj = self._node()
                if isinstance(path, PyTerm):
                    pred = path
                    triples.append(A.TriplePattern(subj, path, obj))
                else:
                    cur_path = path
                    parts.append(A.PathPattern(subj, path, obj))
            # object list: ',' repeats the CURRENT predicate — which may be
            # a path (each comma object gets its own PathPattern), not the
            # last simple predicate seen
            while self.op(","):
                obj = self._node()
                if cur_path is not None:
                    parts.append(A.PathPattern(subj, cur_path, obj))
                else:
                    triples.append(A.TriplePattern(subj, pred, obj))  # noqa: F821
                    self._annotation(subj, pred, obj, triples)
            if self.op(";"):
                if self.peek().kind == "OP" and self.peek().text in ("}", "."):
                    break
                continue
            break
        if self._pending:  # bnode property lists / collections expand here
            triples.extend(self._pending)
            self._pending = []
        if self._pending_paths:  # paths inside bnode property lists
            parts.extend(self._pending_paths)
            self._pending_paths = []
        out: A.Algebra | None = A.BGP(tuple(triples)) if triples else None
        for p in parts:
            out = p if out is None else A.Join(out, p)
        star = self._star_pending
        self._star_pending = []
        if star:
            # RDF-star desugar: component vars bind via accessors; a var
            # the block also binds positionally (or an earlier entry
            # already bound) becomes a sameTerm join constraint instead
            # of a rebinding Extend
            block_vars = {
                n.name for t_ in triples for n in (t_.s, t_.p, t_.o)
                if isinstance(n, A.Var)
            } | {
                n.name for pp in parts for n in (pp.subject, pp.object)
                if isinstance(n, A.Var)
            }
            out = out or A.JoinIdentity()
            bound: set[str] = set()
            for entry in star:
                if entry[0] == "bind":
                    _, name, e = entry
                    if name in bound or name in block_vars:
                        out = A.Filter(out, mkfn("SAMETERM", EVar(name), e))
                    else:
                        out = A.Extend(out, e, name)
                        bound.add(name)
                else:
                    out = A.Filter(out, entry[1])
        return out or A.JoinIdentity()

    def _lookahead_path(self) -> bool:
        """After an IRI/'a' token, does a path operator follow?"""
        nxt = self.peek(1)
        return nxt.kind == "OP" and nxt.text in ("/", "|", "+", "*", "?", "^")

    # -- solution modifiers ----------------------------------------------
    def _select_query(self, top: bool) -> A.SelectQuery:
        self.expect_kw("SELECT")
        distinct = self.kw("DISTINCT")
        reduced = (not distinct) and self.kw("REDUCED")
        outer_aggs = self._aggs
        self._aggs = []
        proj: list[tuple[str, Expr | None]] = []
        star = False
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text == "*":
                self.next()
                star = True
            elif t.kind == "VAR":
                self.next()
                proj.append((t.text[1:], None))
            elif t.kind == "OP" and t.text == "(":
                self.next()
                e = self._expression()
                self.expect_kw("AS")
                var = self.next()
                self.expect_op(")")
                proj.append((var.text[1:], e))
            else:
                break
        if top:
            self._dataset_clause()
        self.expect_kw("WHERE") if (self.peek().kind == "KW" and self.peek().text.upper() == "WHERE") else None
        body = self._group_graph_pattern()
        # §18.2.4.4-adjacent scope rule (same clause as BIND, grammar
        # note 12/13): SELECT (expr AS ?v) may not re-assign a var that
        # the WHERE pattern binds, nor one an earlier AS introduced
        assigned = [n for n, ex in proj if ex is not None]
        if assigned:
            in_scope: set[str] = set()
            _scope_vars(body, in_scope)
            for i, n in enumerate(assigned):
                if n in in_scope or n in assigned[:i]:
                    raise SyntaxError(
                        f"SELECT expression would re-assign in-scope "
                        f"variable ?{n}")

        groups: list[Expr] = []
        group_names: list[str] = []
        if self.kw("GROUP"):
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    groups.append(EVar(t.text[1:]))
                    group_names.append(t.text[1:])
                elif t.kind == "OP" and t.text == "(":
                    self.next()
                    e = self._expression()
                    self.expect_kw("AS")
                    var = self.next()
                    self.expect_op(")")
                    # same scope rule as BIND / SELECT AS: the GROUP BY
                    # binder must be a fresh variable
                    gscope: set[str] = set()
                    _scope_vars(body, gscope)
                    if var.text[1:] in gscope or var.text[1:] in group_names:
                        raise SyntaxError(
                            f"GROUP BY expression would re-assign "
                            f"in-scope variable {var.text}")
                    groups.append(e)
                    group_names.append(var.text[1:])
                else:
                    break
        having: Expr | None = None
        if self.kw("HAVING"):
            self.expect_op("(")
            having = self._expression()
            self.expect_op(")")

        order: list[A.SortComparator] = []
        if self.kw("ORDER"):
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if t.kind == "KW" and t.text.upper() in ("ASC", "DESC"):
                    asc = t.text.upper() == "ASC"
                    self.next()
                    self.expect_op("(")
                    e = self._expression()
                    self.expect_op(")")
                    order.append(A.SortComparator(e, asc))
                elif t.kind == "VAR":
                    self.next()
                    order.append(A.SortComparator(EVar(t.text[1:]), True))
                elif t.kind == "OP" and t.text == "(":
                    self.next()
                    e = self._expression()
                    self.expect_op(")")
                    order.append(A.SortComparator(e, True))
                else:
                    break
        limit = offset = None
        for _ in range(2):
            # grammar [26]/[27]: LIMIT/OFFSET take the unsigned INTEGER
            # token — a signed numeric ("LIMIT -1") is a syntax error
            if self.kw("LIMIT"):
                tok = self.next()
                if not tok.text.isdigit():
                    raise SyntaxError(f"LIMIT requires an unsigned integer, got {tok.text}")
                limit = int(tok.text)
            if self.kw("OFFSET"):
                tok = self.next()
                if not tok.text.isdigit():
                    raise SyntaxError(f"OFFSET requires an unsigned integer, got {tok.text}")
                offset = int(tok.text)

        # grammar [8]/[28]: trailing ValuesClause — joined onto the
        # grouped/aggregated pattern before SELECT expressions and the
        # §18.2.5 modifiers (§18.2.4.6 final VALUES clause)
        vals_table = self._values_clause() if self.kw("VALUES") else None

        aggs = self._aggs
        self._aggs = outer_aggs

        # §19.8 aggregate-projection restriction: in an aggregate query
        # (any aggregate, or GROUP BY), only grouped variables and
        # aggregate results may appear outside aggregate functions —
        # in the projection or in HAVING. (Reference grammar enforces
        # this via swift-sparql-syntax's projection validation.)
        if aggs or groups:
            from kineo_spark.expr import expr_vars

            if star:
                raise SyntaxError("SELECT * cannot be used with GROUP BY "
                                  "or aggregates")
            allowed = set(group_names) | {n for n, _ in aggs}
            aliases: set[str] = set()
            for n, e in proj:
                if e is None:
                    if n not in allowed:
                        raise SyntaxError(
                            f"SELECT ?{n}: variable is neither aggregated "
                            f"nor mentioned in GROUP BY")
                else:
                    vs: set[str] = set()
                    expr_vars(e, vs, [])
                    bad = vs - allowed - aliases
                    if bad:
                        raise SyntaxError(
                            f"SELECT expression references ungrouped, "
                            f"non-aggregated variable ?{sorted(bad)[0]}")
                    aliases.add(n)
            if having is not None:
                vs = set()
                expr_vars(having, vs, [])
                bad = vs - allowed - aliases
                if bad:
                    raise SyntaxError(
                        f"HAVING references ungrouped, non-aggregated "
                        f"variable ?{sorted(bad)[0]}")

        alg = body
        if aggs or groups:
            alg = A.Aggregate(alg, tuple(groups), tuple(group_names), tuple(aggs))
        if vals_table is not None:
            alg = A.Join(alg, vals_table)
        # projection expressions → Extend (before HAVING so it can
        # reference projection aliases of aggregates)
        out_vars: list[str] = []
        for name, e in proj:
            if e is not None and not (isinstance(e, EVar) and e.name == name):
                alg = A.Extend(alg, e, name)
            out_vars.append(name)
        if having is not None:
            alg = A.Filter(alg, having)
        if order:
            alg = A.Order(alg, tuple(order))
        if not star and out_vars:
            alg = A.Project(alg, tuple(out_vars))
        if distinct:
            alg = A.Distinct(alg)
        elif reduced:
            alg = A.Reduced(alg)
        if limit is not None or offset:
            alg = A.Slice(alg, offset or 0, limit)
        return A.SelectQuery(alg, tuple(out_vars) if not star else (),
                             dataset=self._dataset if top else ())

    def _dataset_clause(self) -> None:
        """DatasetClause* : ('FROM' ('NAMED'? IRIref))* — recorded on the
        query form; Engine scopes the store to exactly this dataset
        (SPARQL 1.1 §13.2; reference: Query.dataset via SPARQLSyntax)."""
        defaults: list[str] = []
        named: list[str] = []
        while self.kw("FROM"):
            (named if self.kw("NAMED") else defaults).append(self._term().lex)
        if defaults or named:
            self._dataset = (tuple(defaults), tuple(named))

    def _where_and_modifiers_simple(self) -> A.Algebra:
        self._dataset_clause()
        if self.peek().kind == "KW" and self.peek().text.upper() == "WHERE":
            self.next()
        return self._group_graph_pattern()

    def _construct_query(self) -> A.ConstructQuery:
        self.expect_kw("CONSTRUCT")
        if not (self.peek().kind == "OP" and self.peek().text == "{"):
            # CONSTRUCT WHERE { triples } shorthand: the WHERE pattern is
            # also the template (spec restricts it to plain triples)
            self._dataset_clause()
            self.expect_kw("WHERE")
            body = self._group_graph_pattern()
            template = tuple(_collect_triples(body))
            return A.ConstructQuery(body, template, dataset=self._dataset)
        self.expect_op("{")
        self._in_template = True
        template = self._template_triples()
        self.expect_op("}")
        self._in_template = False
        body = self._where_and_modifiers_simple()
        body = self._apply_template_extends(body)
        return A.ConstructQuery(body, tuple(template), dataset=self._dataset)

    def _template_triples(self, stop_kw: tuple[str, ...] = ()) -> list[A.TriplePattern]:
        """TriplesTemplate: '.'-separated triples with ';'/',' lists,
        ending before '}' or any keyword in ``stop_kw`` (not consumed)."""
        out: list[A.TriplePattern] = []
        while True:
            t = self.peek()
            if t.kind == "EOF" or (t.kind == "OP" and t.text == "}"):
                break
            if t.kind == "KW" and t.text.upper() in stop_kw:
                break
            s = self._node()
            while True:
                p = self._node() if self.peek().kind == "VAR" else self._term()
                o = self._node()
                out.append(A.TriplePattern(s, p, o))
                self._annotation(s, p, o, out)
                while self.op(","):
                    o = self._node()
                    out.append(A.TriplePattern(s, p, o))
                    self._annotation(s, p, o, out)
                if self.op(";"):
                    if self.peek().kind == "OP" and self.peek().text in ("}", "."):
                        break
                    continue
                break
            self.op(".")
        if self._pending:  # [ … ] / ( … ) in template
            out.extend(self._pending)
            self._pending = []
        return out

    def _describe_query(self) -> A.DescribeQuery:
        self.expect_kw("DESCRIBE")
        nodes: list = []
        star = self.peek().kind == "OP" and self.peek().text == "*"
        if star:
            self.next()  # DESCRIBE * — all in-scope vars (resolved below)
        while True:
            t = self.peek()
            if t.kind == "VAR":
                self.next()
                nodes.append(A.Var(t.text[1:]))
            elif t.kind in ("IRI", "PNAME"):
                nodes.append(self._term())
            else:
                break
        if not star and not nodes:
            # grammar [11]: DESCRIBE ( VarOrIri+ | '*' )
            raise SyntaxError("DESCRIBE requires at least one IRI/var or '*'")
        self._dataset_clause()
        body = A.JoinIdentity()
        if self.peek().kind == "KW" and self.peek().text.upper() == "WHERE" or (
            self.peek().kind == "OP" and self.peek().text == "{"
        ):
            body = self._where_and_modifiers_simple()
        if star:
            # DESCRIBE * — every variable the WHERE pattern binds
            in_scope: set[str] = set()
            _scope_vars(body, in_scope)
            nodes = [A.Var(n) for n in sorted(in_scope)]
        return A.DescribeQuery(body, tuple(nodes), dataset=self._dataset)


    # -- SPARQL 1.1 Update (extension; ops in algebra.py) -----------------
    def parse_update(self) -> list:
        """UpdateUnit: ';'-separated operations, each with its own
        (accumulating) prologue."""
        ops: list = []
        while True:
            self._prologue()
            t = self.peek()
            if t.kind == "EOF":
                break
            word = t.text.upper() if t.kind == "KW" else ""
            if word == "INSERT":
                self.next()
                if self.kw("DATA"):
                    ops.append(A.InsertData(tuple(self._quad_block(ground=True))))
                else:
                    ops.append(self._modify_tail((), self._quad_templates(), None))
            elif word == "DELETE":
                self.next()
                ops.append(self._delete_tail(None))
            elif word == "WITH":
                self.next()
                g = self._term()
                if self.kw("DELETE"):
                    ops.append(self._delete_tail(g, kw_consumed=True))
                else:
                    self.expect_kw("INSERT")
                    ops.append(self._modify_tail((), self._quad_templates(), g))
            elif word in ("CLEAR", "DROP"):
                self.next()
                silent = self.kw("SILENT")
                ops.append(A.Clear(self._graph_ref(), silent))
            elif word == "CREATE":
                self.next()
                silent = self.kw("SILENT")
                self.expect_kw("GRAPH")
                ops.append(A.Create(self._term(), silent))
            elif word in ("COPY", "MOVE", "ADD"):
                self.next()
                silent = self.kw("SILENT")
                s = self._graph_or_default()
                self.expect_kw("TO")
                d = self._graph_or_default()
                ops.append(A.GraphMgmt(word, s, d, silent))
            elif word == "LOAD":
                self.next()
                silent = self.kw("SILENT")
                src = self._term()
                g = None
                if self.kw("INTO"):
                    self.expect_kw("GRAPH")
                    g = self._term()
                ops.append(A.LoadOp(src.lex, g, silent))
            else:
                raise SyntaxError(f"expected update operation, got {t}")
            if not self.op(";"):
                break
        if self.peek().kind != "EOF":
            raise SyntaxError(f"trailing input at {self.peek()}")
        return ops

    def _delete_tail(self, with_graph, kw_consumed: bool = False):
        """After DELETE: DATA { }, WHERE { } shorthand, or
        template [INSERT template] WHERE pattern."""
        if not kw_consumed and self.kw("DATA"):
            quads = tuple(self._quad_block(ground=True))
            self._no_bnodes(quads)
            return A.DeleteData(quads)
        if self.kw("WHERE"):
            # DELETE WHERE { pattern }: the pattern is its own template
            pats = tuple(self._quad_block(ground=False))
            if self._template_extends:
                # the dual template/pattern role can't carry a quoted
                # term with variables (it would need decomposition on
                # the pattern side AND construction on the template
                # side) — fail loudly, the long form expresses it
                self._template_extends = []
                raise SyntaxError(
                    "quoted triples with variables are not supported in "
                    "DELETE WHERE — use DELETE {...} WHERE {...}")
            self._no_bnodes(pats)
            return A.Modify(pats, (), _quads_algebra(pats), with_graph)
        dels = self._quad_templates()
        self._no_bnodes(dels)
        ins = self._quad_templates() if self.kw("INSERT") else ()
        return self._modify_tail(dels, ins, with_graph)

    def _modify_tail(self, dels, ins, with_graph):
        # UsingClause* : ('USING' 'NAMED'? iri)* — the WHERE dataset
        defaults: list[str] = []
        named: list[str] = []
        while self.kw("USING"):
            (named if self.kw("NAMED") else defaults).append(self._term().lex)
        dataset = (tuple(defaults), tuple(named)) if defaults or named else ()
        self.expect_kw("WHERE")
        body = self._apply_template_extends(self._group_graph_pattern())
        return A.Modify(dels, ins, body, with_graph, dataset)

    def _graph_or_default(self):
        if self.kw("DEFAULT"):
            return "DEFAULT"
        self.kw("GRAPH")  # optional keyword before the IRI
        return self._term()

    def _graph_ref(self):
        if self.kw("GRAPH"):
            return self._term()
        for word in ("DEFAULT", "NAMED", "ALL"):
            if self.kw(word):
                return word
        raise SyntaxError(
            f"expected GRAPH <iri> | DEFAULT | NAMED | ALL, got {self.peek()}")

    def _quad_templates(self) -> tuple:
        return tuple(self._quad_block(ground=False))

    def _quad_block(self, ground: bool) -> list:
        """QuadPattern / QuadData: {{ triples (GRAPH g {{ triples }})* }}
        → list of (TriplePattern, graph-node | None)."""
        self.expect_op("{")
        self._in_template = True
        quads: list = []
        while True:
            if self.op("}"):
                break
            if self.kw("GRAPH"):
                if self.peek().kind == "VAR" and not ground:
                    g = A.Var(self.next().text[1:])
                else:
                    g = self._term()
                self.expect_op("{")
                for tp in self._template_triples():
                    quads.append((tp, g))
                self.expect_op("}")
                self.op(".")
            else:
                for tp in self._template_triples(stop_kw=("GRAPH",)):
                    quads.append((tp, None))
        self._in_template = False
        if ground:
            for tp, g in quads:
                if any(isinstance(n, A.Var) for n in (tp.s, tp.p, tp.o, g)):
                    raise SyntaxError("variables are not allowed in DATA blocks")
        return quads

    def _no_bnodes(self, quads) -> None:
        from kineo_spark.model import KIND_BLANK
        for tp, _g in quads:
            for node in (tp.s, tp.p, tp.o):
                if isinstance(node, PyTerm) and node.kind == KIND_BLANK:
                    raise SyntaxError(
                        "blank nodes cannot appear in DELETE templates (§3.1.3)")


def _quads_algebra(quads, active_graph=None) -> A.Algebra:
    """Quad templates → pattern algebra (for the DELETE WHERE shorthand):
    default-graph triples form a BGP, GRAPH-scoped groups wrap in
    NamedGraph, all joined."""
    groups: list[tuple[object, list]] = []
    for tp, g in quads:
        for kg, lst in groups:
            if kg == g:
                lst.append(tp)
                break
        else:
            groups.append((g, [tp]))
    parts = [
        A.NamedGraph(g, A.BGP(tuple(tps))) if g is not None else A.BGP(tuple(tps))
        for g, tps in groups
    ]
    out = parts[0] if parts else A.JoinIdentity()
    for p in parts[1:]:
        out = A.Join(out, p)
    return out


def parse_query(text: str):
    """SPARQL text → query-form dataclass (SelectQuery / AskQuery /
    ConstructQuery / DescribeQuery)."""
    return Parser(text).parse_query()


def parse_update(text: str) -> list:
    """SPARQL 1.1 Update text → list of update-operation dataclasses
    (InsertData / DeleteData / Modify / Clear / Create / LoadOp)."""
    return Parser(text).parse_update()


def _scope_vars(n, out: set) -> None:
    """Binding variables in scope of an algebra subtree (SPARQL 1.1
    §18.2.1). Precisely: MINUS contributes only its lhs's vars; filter
    expressions (including EXISTS sub-patterns, which compile to
    SemiJoin rhs) contribute nothing; Expr subtrees are never
    descended."""
    import dataclasses

    if isinstance(n, Expr):
        # Filter/LeftJoin expressions (and EXISTS patterns inside them)
        # contribute no in-scope variables (§18.2.1).
        return
    if isinstance(n, A.Var):
        if n.binding:
            out.add(n.name)
        return
    if isinstance(n, A.Subquery):
        out.update(n.query.variables)
        return
    if isinstance(n, A.Extend):  # BIND binder is a plain string
        out.add(n.name)
        _scope_vars(n.child, out)
        return
    if isinstance(n, A.Table):  # VALUES binders are plain strings
        out.update(n.variables)
        return
    if isinstance(n, A.Minus):  # §18.2.1: in-scope(Minus(P1,P2)) = P1 only
        _scope_vars(n.lhs, out)
        return
    if isinstance(n, A.SemiJoin):  # FILTER (NOT) EXISTS: rhs is expr-scope
        _scope_vars(n.lhs, out)
        return
    if dataclasses.is_dataclass(n) and not isinstance(n, type):
        for f in dataclasses.fields(n):
            v = getattr(n, f.name)
            if isinstance(v, Expr):
                continue
            if isinstance(v, (A.Algebra, A.Var, list, tuple)) or (
                    dataclasses.is_dataclass(v) and not isinstance(v, type)):
                _scope_vars(v, out)
    elif isinstance(n, (list, tuple)):
        for x in n:
            _scope_vars(x, out)


def _as_path(p) -> A.Path:
    if isinstance(p, PyTerm):
        return A.PLink(p)
    return p


def _collect_triples(node: A.Algebra) -> list[A.TriplePattern]:
    """Triples of a CONSTRUCT WHERE body (plain-triples patterns only)."""
    if isinstance(node, A.BGP):
        return list(node.patterns)
    if isinstance(node, A.Triple):
        return [node.pattern]
    if isinstance(node, A.Join):
        return _collect_triples(node.lhs) + _collect_triples(node.rhs)
    if isinstance(node, A.JoinIdentity):
        return []
    raise SyntaxError(
        "CONSTRUCT WHERE requires a plain triples pattern "
        f"(got {type(node).__name__})"
    )
