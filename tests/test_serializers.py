"""Result serializer + language-preference tests."""

import json

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.forms import select
from kineo_spark.model import iri
from kineo_spark import serializers as ser

FOAF = "http://xmlns.com/foaf/0.1/"
EX = "http://example.org/"


def _df(fixture_store):
    comp = Compiler(fixture_store)
    alg = A.LeftJoin(
        A.Triple(A.TriplePattern(A.Var("s"), iri(EX + "value"), A.Var("v"))),
        A.Triple(A.TriplePattern(A.Var("s"), iri(FOAF + "name"), A.Var("name"))),
    )
    return select(comp, A.SelectQuery(alg, ("s", "v", "name")))


def test_sparql_json(fixture_store):
    out = json.loads(ser.to_sparql_json(_df(fixture_store)))
    assert out["head"]["vars"] == ["s", "v", "name"]
    assert len(out["results"]["bindings"]) == 2
    b = {x["v"]["value"]: x for x in out["results"]["bindings"]}
    assert b["32.7"]["v"]["datatype"].endswith("float")
    assert "name" not in b["-118"]  # unbound omitted
    assert json.loads(ser.ask_to_sparql_json(True))["boolean"] is True


def test_sparql_xml_tsv_csv(fixture_store):
    df = _df(fixture_store)
    xml = ser.to_sparql_xml(df)
    assert '<variable name="v"/>' in xml and "<bnode>" in xml
    tsv = ser.to_sparql_tsv(df)
    assert tsv.splitlines()[0] == "?s\t?v\t?name"
    assert '"32.7"^^<http://www.w3.org/2001/XMLSchema#float>' in tsv
    csv_ = ser.to_sparql_csv(df)
    assert csv_.splitlines()[0] == "s,v,name"


def test_negotiate():
    mt, f = ser.negotiate("text/tab-separated-values, application/json;q=0.9")
    assert mt == "text/tab-separated-values"
    mt, f = ser.negotiate("application/weird")
    assert mt == "application/sparql-results+json"


def test_best_language_filter(spark):
    from kineo_spark.langpref import best_language_quads

    rows = [
        (0, EX + "x", EX + "label", 2, "Hallo", "langString", "de", None, "g"),
        (0, EX + "x", EX + "label", 2, "Hello", "langString", "en", None, "g"),
        (0, EX + "x", EX + "label", 2, "Bonjour", "langString", "fr", None, "g"),
        (0, EX + "x", EX + "size", 2, "5", "integer", None, 5.0, "g"),
    ]
    from kineo_spark.store import QuadsDataFrameStore

    quads = QuadsDataFrameStore.from_rows(spark, rows).quads()
    out = best_language_quads(quads, "en;q=0.9, de;q=0.5").collect()
    lex = sorted(r.o_lex for r in out)
    assert lex == ["5", "Hello"]


def test_tsv_parser_reference_fixture():
    """The reference's SPARQLTSVParser fixture, byte for byte
    (SPARQLTSVSyntax.swift:46-90): IRIs, bnodes, dquote escapes, empty
    cells, fully-empty rows, lang tags, bare-integer abbreviation."""
    from kineo_spark.serializers import from_sparql_tsv

    tsv = ('?x\t?literal\n'
           '<http://example/x>\t"String"\n'
           '<http://example/x>\t"String-with-dquote\\""\n'
           '_:blank0\t"Blank node"\n'
           '\t"Missing \'x\'"\n'
           '\t\n'
           '<http://example/x>\t\n'
           '_:blank1\t"String-with-lang"@en\n'
           '_:blank1\t123\n')
    variables, rows = from_sparql_tsv(tsv)
    assert variables == ["x", "literal"]
    assert len(rows) == 8
    assert rows[0]["x"].lex == "http://example/x"
    assert rows[1]["literal"].lex == 'String-with-dquote"'
    assert rows[2]["x"].kind == 1 and rows[2]["x"].lex == "blank0"
    assert "x" not in rows[3] and rows[3]["literal"].lex == "Missing 'x'"
    assert rows[4] == {}
    assert "literal" not in rows[5]
    assert rows[6]["literal"].lang == "en"
    assert (rows[7]["literal"].lex, rows[7]["literal"].dt) == ("123", "integer")


def test_tsv_serializer_escapes_and_abbreviates(spark):
    """Serialize side (SPARQLTSV.swift:11-153 / SPARQLTSVSyntax.swift
    testTSV1-2): bare xsd:integer, typed double, TAB/LF escaped inside
    literal cells so framing survives, unbound = empty cell — and the
    round trip through from_sparql_tsv reproduces the input terms."""
    from pyspark.sql import functions as F

    from kineo_spark.model import (iri_col, lit_numeric_col, lit_string_col)
    from kineo_spark.serializers import from_sparql_tsv, to_sparql_tsv

    df = spark.range(1).select(
        lit_string_col(F.lit("Berlin")).alias("name"),
        lit_numeric_col(F.lit(7), "integer").alias("value"),
        lit_numeric_col(F.lit(1.2), "double").alias("weight"),
        lit_string_col(F.lit("a\tb\nc")).alias("messy"),
        F.when(F.lit(False), iri_col(F.lit("x"), nonnull=True))
         .alias("missing"),  # always-null term column = unbound
    )
    text = to_sparql_tsv(df)
    lines = text.split("\n")
    assert lines[0] == "?name\t?value\t?weight\t?messy\t?missing"
    cells = lines[1].split("\t")
    assert cells[0] == '"Berlin"'
    assert cells[1] == "7"  # bare integer abbreviation
    assert cells[2].endswith("XMLSchema#double>")
    assert cells[3] == '"a\\tb\\nc"'  # TAB and LF escaped, framing intact
    assert cells[4] == ""
    _, rows = from_sparql_tsv(text)
    r = rows[0]
    assert r["messy"].lex == "a\tb\nc" and "missing" not in r
    assert (r["value"].lex, r["value"].dt) == ("7", "integer")


def test_csv_serializer_bnode_and_quoting(spark):
    """CSV side (csv-tsv-res §3): plain lexical values, RFC 4180
    quoting, blank nodes keep _:label."""
    from pyspark.sql import functions as F

    from kineo_spark.model import blank_col, lit_string_col
    from kineo_spark.serializers import from_sparql_csv, to_sparql_csv

    df = spark.range(1).select(
        lit_string_col(F.lit('say "hi", ok')).alias("a"),
        blank_col(F.lit("b0")).alias("b"),
    )
    text = to_sparql_csv(df)
    assert text.splitlines()[0] == "a,b"
    assert '"say ""hi"", ok"' in text
    assert "_:b0" in text
    _, rows = from_sparql_csv(text)
    assert rows[0] == {"a": 'say "hi", ok', "b": "_:b0"}


def test_tsv_cell_roundtrip_property():
    """Property: any PyTerm serialized by the TSV rules re-parses to an
    equal term (hypothesis over IRIs, bnodes, plain/lang/typed literals
    with adversarial lexical content incl. tabs, CRLF, quotes,
    backslashes, non-BMP)."""
    from hypothesis import given, settings, strategies as st

    from kineo_spark.model import KIND_BLANK, KIND_IRI, KIND_LITERAL, PyTerm
    from kineo_spark.serializers import _parse_tsv_cell, _tsv_term

    lexes = st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=32, max_codepoint=0x10FFFF,
                          blacklist_categories=("Cs",)),
            st.sampled_from(list('\t\n\r"\\'))),
        min_size=0, max_size=40)
    safe_iri = st.text(alphabet=st.characters(
        min_codepoint=33, max_codepoint=126,
        blacklist_characters="<>\"{}|^`\\"), min_size=1, max_size=30)
    label = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True)
    lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,8})?", fullmatch=True)
    dts = st.sampled_from(
        ["string", "integer", "decimal", "double", "boolean", "date",
         "dateTime", "http://example.org/customDT"])

    terms = st.one_of(
        st.builds(lambda l: PyTerm(KIND_IRI, l), safe_iri),
        st.builds(lambda l: PyTerm(KIND_BLANK, l), label),
        st.builds(lambda l: PyTerm(KIND_LITERAL, l, "string"), lexes),
        st.builds(lambda l, lg: PyTerm(KIND_LITERAL, l, "langString", lg),
                  lexes, lang),
        st.builds(lambda l, d: PyTerm(KIND_LITERAL, l, d), lexes, dts),
    )

    @settings(max_examples=400, deadline=None)
    @given(terms)
    def check(t):
        cell = _tsv_term(t)
        assert "\t" not in cell and "\n" not in cell and "\r" not in cell
        back = _parse_tsv_cell(cell)
        assert back == t, (t, cell, back)

    check()
