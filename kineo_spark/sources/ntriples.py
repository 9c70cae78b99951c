"""Distributed N-Triples / N-Quads parser and serializer.

Reference: /root/reference/Sources/Kineo/RDF/NTriples.swift:193-433
(parser) and :157-192 (serializer). N-Triples is line-oriented, so the
load parallelizes trivially: ``spark.read.text`` splits the file across
executors and each line parses independently — at 100 TB this is an
embarrassingly parallel scan, no driver bottleneck. The parse itself is
pure Column regexp work (whole-stage codegen), not a Python UDF.

Turtle/TriG/RDF-XML (reference SerdParser.swift / RDFXML.swift) are
format conversions, not engine semantics; load them by converting to
N-Triples up front or via rdflib in mapPartitions if available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kineo_spark.model import (
    IRI_DT, KIND_BLANK, KIND_IRI, KIND_LITERAL, NUMERIC_DTS, QUADS_SCHEMA,
    TEMPORAL_DTS,
)

# one N-Triples/N-Quads statement:  subject predicate object [graph] .
_IRI = r"<([^>]*)>"
_BNODE = r"_:([^\s]+)"
_LIT = r'"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?'
_SUBJ = rf"(?:{_IRI}|{_BNODE})"
# groups:        1=s_iri 2=s_bnode  3=p_iri   4=o_iri 5=o_bnode 6=o_lit 7=o_dt 8=o_lang 9=g_iri 10=g_bnode
_STMT = (
    rf"^\s*(?:<([^>]*)>|_:(\S+))\s+<([^>]*)>\s+"
    rf"(?:<([^>]*)>|_:(\S+)|\"((?:[^\"\\]|\\.)*)\"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)"
    rf"\s*(?:(?:<([^>]*)>|_:(\S+))\s*)?\.\s*$"
)


# noncharacter sentinel: stands in for an escaped backslash during the
# unescape passes so '\\n' (escaped backslash + n) never reads as newline
_SENT = "￿"
_BIG = 1 << 24  # "rest of string" length for substring


def _u16(s, start, nhex):
    return F.decode(F.unhex(F.substring(s, start, nhex)), "UTF-16BE")


def _unescape(col):
    """N-Triples string escapes → raw, single-pass-equivalent and fully
    JVM-side. Order matters: '\\\\' is replaced by a sentinel FIRST (so a
    literal backslash followed by 'n' never decodes as newline), then the
    simple escapes, then \\uXXXX / \\UXXXXXXXX via split + hex decode
    (UTF-16BE / UTF-32BE; adjacent surrogate-pair \\u escapes are kept in
    one segment and decode together). Sentinel restores to '\\' last."""
    out = F.regexp_replace(col, r"\\\\", _SENT)
    for esc, rep in ((r"\\n", "\n"), (r"\\t", "\t"), (r"\\r", "\r"),
                     (r"\\b", "\b"), (r"\\f", "\f"), (r'\\"', '"'), (r"\\'", "'")):
        out = F.regexp_replace(out, esc, rep)
    seg = F.split(
        out,
        r"(?:(?<!\\u[dD][89abAB][0-9a-fA-F]{2})(?=\\u[0-9a-fA-F]{4})|(?=\\U[0-9a-fA-F]{8}))",
    )
    fixed = F.transform(seg, lambda s:
        F.when(
            s.rlike(r"^\\u[dD][89abAB][0-9a-fA-F]{2}\\u[0-9a-fA-F]{4}"),
            F.concat(F.decode(F.unhex(F.concat(F.substring(s, 3, 4), F.substring(s, 9, 4))), "UTF-16BE"),
                     F.substring(s, 13, _BIG)))
        .when(s.rlike(r"^\\u[0-9a-fA-F]{4}"),
              F.concat(_u16(s, 3, 4), F.substring(s, 7, _BIG)))
        .when(s.rlike(r"^\\U[0-9a-fA-F]{8}"),
              F.concat(F.decode(F.unhex(F.substring(s, 3, 8)), "UTF-32"),
                       F.substring(s, 11, _BIG)))
        .otherwise(s))
    decoded = F.when(out.rlike(r"\\[uU]"), F.array_join(fixed, "")).otherwise(out)
    return F.regexp_replace(decoded, _SENT, r"\\")


def load_ntriples(
    spark: SparkSession, path: str, default_graph: str = "urn:g:default"
) -> DataFrame:
    """Parse an N-Triples or N-Quads file (or directory/glob) into the
    flat FIXTURES §0 quads schema."""
    lines = spark.read.text(path)
    lines = lines.filter(
        (F.length(F.trim(F.col("value"))) > 0) & ~F.trim(F.col("value")).startswith("#")
    )
    # RDF-star: lines that may contain a quoted triple go through the
    # recursive Arrow-batched parser (the Column regex cannot nest);
    # routing by substring is a superset — the Python parser handles
    # plain lines identically — and the common case stays pure Column
    star_branch = lines.filter(F.col("value").contains("<<")).mapInPandas(
        lambda it: _star_rows(it, default_graph), QUADS_SCHEMA)
    lines = lines.filter(~F.col("value").contains("<<"))
    g = lambda i: F.regexp_extract(F.col("value"), _STMT, i)  # noqa: E731

    s_iri, s_bn = g(1), g(2)
    p_iri = g(3)
    o_iri, o_bn, o_lit, o_dt_iri, o_lang = g(4), g(5), g(6), g(7), g(8)
    g_iri = g(9)

    parsed = lines.select(
        F.when(s_iri != "", F.lit(KIND_IRI).cast("tinyint"))
        .when(s_bn != "", F.lit(KIND_BLANK).cast("tinyint")).alias("s_kind"),
        F.when(s_iri != "", s_iri).otherwise(s_bn).alias("s_lex"),
        F.when(p_iri != "", p_iri).alias("p_lex"),
        F.when(o_iri != "", F.lit(KIND_IRI).cast("tinyint"))
        .when(o_bn != "", F.lit(KIND_BLANK).cast("tinyint"))
        .otherwise(F.lit(KIND_LITERAL).cast("tinyint")).alias("o_kind"),
        F.when(o_iri != "", o_iri).when(o_bn != "", o_bn)
        .otherwise(_unescape(o_lit)).alias("o_lex_raw"),
        o_dt_iri.alias("o_dt_iri"), o_lang.alias("o_lang_raw"),
        F.when(g_iri != "", g_iri).otherwise(F.lit(default_graph)).alias("g_lex"),
    ).filter(F.col("p_lex").isNotNull())

    dt_map = F.create_map(*[F.lit(x) for kv in IRI_DT.items() for x in kv])
    dt_tok = (
        F.when(parsed["o_kind"] != KIND_LITERAL, F.lit(None).cast("string"))
        .when(parsed["o_lang_raw"] != "", F.lit("langString"))
        .when(parsed["o_dt_iri"] != "", F.coalesce(dt_map[parsed["o_dt_iri"]], parsed["o_dt_iri"]))
        .otherwise(F.lit("string"))
    )
    # try_: an ill-typed literal ("abc"^^xsd:integer is legal RDF) gets a
    # NULL numeric shadow, never an ANSI runtime error at load.
    num = F.when(
        dt_tok.isin(*NUMERIC_DTS), parsed["o_lex_raw"].try_cast("double")
    ).when(dt_tok == "boolean", (parsed["o_lex_raw"] == "true").cast("double")) \
     .when(
        dt_tok.isin(*TEMPORAL_DTS),
        # session tz is UTC; naive lexical forms are treated as UTC
        F.unix_micros(F.try_to_timestamp(parsed["o_lex_raw"])).cast("double"),
    )

    return parsed.select(
        "s_kind", "s_lex", "p_lex", "o_kind",
        F.col("o_lex_raw").alias("o_lex"),
        dt_tok.alias("o_dt"),
        F.when(F.col("o_lang_raw") != "", F.col("o_lang_raw")).alias("o_lang"),
        num.alias("o_num"), "g_lex",
    ).unionByName(star_branch)


def serialize_ntriples(quads: DataFrame, with_graph: bool = False) -> DataFrame:
    """Quads → one N-Triples/N-Quads line per row (column 'line').
    Mirrors NTriples.swift:157-192; distributed (df.write.text-ready)."""
    from kineo_spark.model import DT_IRI

    def term(kind, lex, dt=None, lang=None):
        esc = F.regexp_replace(F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.regexp_replace(
                lex, r"\\", r"\\\\"), '"', '\\\\"'),
            "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t",
        )
        dt_map = F.create_map(*[F.lit(x) for kv in DT_IRI.items() for x in kv])
        plain = F.concat(F.lit('"'), esc, F.lit('"'))
        if dt is None:
            return F.when(kind == KIND_IRI, F.concat(F.lit("<"), lex, F.lit(">"))).otherwise(
                F.concat(F.lit("_:"), lex)
            )
        lit_form = (
            F.when(lang.isNotNull(), F.concat(plain, F.lit("@"), lang))
            .when(
                dt.isNotNull() & (dt != "string"),
                F.concat(plain, F.lit("^^<"), F.coalesce(dt_map[dt], dt), F.lit(">")),
            )
            .otherwise(plain)
        )
        return (
            F.when(kind == KIND_IRI, F.concat(F.lit("<"), lex, F.lit(">")))
            .when(kind == KIND_BLANK, F.concat(F.lit("_:"), lex))
            .otherwise(lit_form)
        )

    parts = [
        term(F.col("s_kind"), F.col("s_lex")),
        term(F.lit(KIND_IRI), F.col("p_lex")),
        term(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"), F.col("o_lang")),
    ]
    if with_graph:
        parts.append(term(F.lit(KIND_IRI), F.col("g_lex")))
    from kineo_spark.model import KIND_QUOTED
    star_cond = (F.col("s_kind") == KIND_QUOTED) | (F.col("o_kind") == KIND_QUOTED)
    plain = quads.filter(~star_cond).select(
        F.concat_ws(" ", *parts, F.lit(".")).alias("line"))

    def _star_lines(it):
        import pandas as pd
        from kineo_spark.model import PyTerm
        for pdf in it:
            lines = []
            for r in pdf.itertuples(index=False):
                dt = r.o_dt if isinstance(r.o_dt, str) else None
                lang = r.o_lang if isinstance(r.o_lang, str) else None
                s = PyTerm(int(r.s_kind), r.s_lex).n3()
                p = PyTerm(KIND_IRI, r.p_lex).n3()
                o = PyTerm(int(r.o_kind), r.o_lex, dt, lang).n3()
                tail = (f" <{r.g_lex}>" if with_graph else "")
                lines.append(f"{s} {p} {o}{tail} .")
            yield pd.DataFrame({"line": lines})

    star = quads.filter(star_cond).mapInPandas(_star_lines, "line string")
    return plain.unionByName(star)


# ---------------------------------------------------------------------------
# N-Triples-star / N-Quads-star (RDF-star extension, KIND_QUOTED)
# ---------------------------------------------------------------------------

_PY_ESC = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
           '"': '"', "'": "'", "\\": "\\"}


def _py_unescape(s: str) -> str:
    """Python twin of _unescape for the star branch (same escapes)."""
    if "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16))); i += 6
            elif n == "U":
                out.append(chr(int(s[i + 2:i + 10], 16))); i += 10
            else:
                out.append(_PY_ESC.get(n, n)); i += 2
        else:
            out.append(c); i += 1
    text = "".join(out)
    try:  # combine any \uD800-\uDFFF surrogate pairs into code points
        return text.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        return text


def _parse_star_term(s: str, i: int):
    """One N-Triples-star term at s[i:] → (PyTerm, next index).
    Recursive for << s p o >>."""
    from kineo_spark.model import KIND_BLANK as KB, KIND_LITERAL as KL, PyTerm, iri, quoted

    while i < len(s) and s[i].isspace():
        i += 1
    if s.startswith("<<", i):
        i += 2
        t1, i = _parse_star_term(s, i)
        t2, i = _parse_star_term(s, i)
        t3, i = _parse_star_term(s, i)
        while i < len(s) and s[i].isspace():
            i += 1
        if not s.startswith(">>", i):
            raise SyntaxError(f"unterminated quoted triple at {i}: {s!r}")
        return quoted(t1, t2, t3), i + 2
    if s[i] == "<":
        j = s.index(">", i)
        return iri(_py_unescape(s[i + 1:j])), j + 1
    if s.startswith("_:", i):
        j = i + 2
        # '>' never appears in a BLANK_NODE_LABEL (stops '_:b>>')
        while j < len(s) and not s[j].isspace() and s[j] != ">":
            j += 1
        # dots may appear INSIDE a label but never terminate one
        # (N-Triples grammar): a trailing '.' is the statement
        # terminator the scan folded in — give back AT MOST ONE dot
        # for the caller, matching the Column regex path (ADVICE r6:
        # '_:b.' at end-of-line parsed as label 'b.' only when
        # star-routed). Stripping ALL trailing dots would silently
        # reshape invalid labels like '_:b..' into 'b' instead of
        # letting deeper validation reject the dot-final label
        # (ADVICE r7).
        if j > i + 2 and s[j - 1] == ".":
            j -= 1
        return PyTerm(KB, s[i + 2:j]), j
    if s[i] == '"':
        j = i + 1
        while s[j] != '"':
            j += 2 if s[j] == "\\" else 1
        lex = _py_unescape(s[i + 1:j])
        j += 1
        if s.startswith("^^<", j):
            k = s.index(">", j)
            dt_iri = s[j + 3:k]
            return PyTerm(KL, lex, IRI_DT.get(dt_iri, dt_iri)), k + 1
        if j < len(s) and s[j] == "@":
            k = j + 1
            while k < len(s) and (s[k].isalnum() or s[k] == "-"):
                k += 1
            return PyTerm(KL, lex, "langString", s[j + 1:k]), k
        return PyTerm(KL, lex, "string"), j
    raise SyntaxError(f"cannot parse term at {i}: {s!r}")


def _star_rows(lines, default_graph: str):
    """pandas iterator: full-line N-Triples-star parse via PyTerm —
    exactly the recursive grammar the Column regex cannot express."""
    import pandas as pd

    from kineo_spark.model import KIND_IRI as KI

    cols = ["s_kind", "s_lex", "p_lex", "o_kind", "o_lex", "o_dt",
            "o_lang", "o_num", "g_lex"]
    for pdf in lines:
        rows = []
        for raw in pdf["value"]:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            s, i = _parse_star_term(line, 0)
            p, i = _parse_star_term(line, i)
            o, i = _parse_star_term(line, i)
            while i < len(line) and line[i].isspace():
                i += 1
            g_lex = default_graph
            if i < len(line) and line[i] != ".":
                g, i = _parse_star_term(line, i)
                g_lex = g.lex
            rows.append((s.kind, s.lex, p.lex, o.kind, o.lex,
                         o.dt, o.lang, o.num, g_lex))
        out = pd.DataFrame(rows, columns=cols)
        if len(out):
            out["s_kind"] = out["s_kind"].astype("int8")
            out["o_kind"] = out["o_kind"].astype("int8")
            out["o_num"] = out["o_num"].astype("float64")
        else:
            out = out.astype({"s_kind": "int8", "o_kind": "int8",
                              "o_num": "float64"})
        yield out
