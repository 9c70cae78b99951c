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

from kineo_spark.model import IRI_DT, KIND_BLANK, KIND_IRI, KIND_LITERAL, NUMERIC_DTS, TEMPORAL_DTS

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
    )


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
    return quads.select(F.concat_ws(" ", *parts, F.lit(".")).alias("line"))
