"""Turtle parser/serializer tests — including the reference's geo
example shape (README.md:24-56: 2-pattern BGP + numeric filters)."""

from kineo_spark.engine import Engine
from kineo_spark.sources.turtle import load_turtle, serialize_turtle
from kineo_spark.store import QuadsDataFrameStore

GEO_TTL = """
@prefix geo: <http://www.w3.org/2003/01/geo/wgs84_pos#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@base <http://example.org/> .

<Berlin> geo:lat "52.5167"^^<http://www.w3.org/2001/XMLSchema#decimal> ;
         geo:long "13.3833"^^<http://www.w3.org/2001/XMLSchema#decimal> ;
         rdfs:label "Berlin"@de, "Berlin"@en .
<Potsdam> geo:lat 52.4 ; geo:long 13.0667 .
<Tokyo> geo:lat 35.69 ; geo:long 139.69 .
_:anon a rdfs:Resource ; rdfs:seeAlso ( <Berlin> <Potsdam> ) .
"""


def test_turtle_parse_and_query(spark):
    quads = load_turtle(spark, GEO_TTL)
    store = QuadsDataFrameStore(spark, quads)
    engine = Engine(store)
    # the reference README query shape: places within a lat/long box
    r = engine.query("""
      PREFIX geo: <http://www.w3.org/2003/01/geo/wgs84_pos#>
      SELECT ?s ?lat ?long WHERE {
        ?s geo:lat ?lat ; geo:long ?long .
        FILTER(?lat >= 52.0) FILTER(?lat <= 53.0) FILTER(?long < 14.0)
      } ORDER BY ?s
    """)
    rows = r.bindings.collect()
    names = [row["s"]["lex"].split("/")[-1] for row in rows]
    assert names == ["Berlin", "Potsdam"]


def test_turtle_lang_and_collections(spark):
    quads = load_turtle(spark, GEO_TTL)
    rows = quads.collect()
    langs = {r.o_lang for r in rows if r.o_lang}
    assert langs == {"de", "en"}
    # collection becomes rdf:first/rdf:rest chain
    firsts = [r for r in rows if r.p_lex.endswith("#first")]
    rests = [r for r in rows if r.p_lex.endswith("#rest")]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(r.o_lex.endswith("nil") for r in rests)


def test_turtle_serializer_roundtrip(spark):
    quads = load_turtle(spark, GEO_TTL)
    text = serialize_turtle(
        quads, {"geo": "http://www.w3.org/2003/01/geo/wgs84_pos#"}
    )
    assert "@prefix geo:" in text
    assert "geo:lat" in text
    back = load_turtle(spark, text)
    assert back.count() == quads.count()


# ---------------------------------------------------------------------------
# Distributed statement-parallel loader
# ---------------------------------------------------------------------------

DIST_TTL = """\
@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
# a comment in the header

ex:a ex:p ex:b .
ex:a ex:q "dot . inside # string" ;
     ex:r 1.5, 2 .
ex:b rdfs:label "b"@en .
ex:c ex:list ( ex:a ex:b ) .
ex:d ex:props [ ex:w 1 ; ex:h 2 ] .
ex:e ex:iri <http://example.org/path.with#dots> . # trailing comment
ex:p1.2x ex:p 1.
"""


def _canon(rows):
    """Quad multiset with bnode labels wiped (fresh-bnode names differ
    between the driver and distributed parsers by construction)."""
    out = []
    for r in rows:
        s_lex = "_b_" if r.s_kind == 1 else r.s_lex
        o_lex = "_b_" if r.o_kind == 1 else r.o_lex
        out.append((r.s_kind, s_lex, r.p_lex, r.o_kind, o_lex, r.o_dt, r.o_lang, r.o_num, r.g_lex))
    return sorted(out)


def test_turtle_distributed_matches_driver(spark, tmp_path):
    from kineo_spark.sources.turtle import load_turtle_distributed

    p = tmp_path / "dist.ttl"
    p.write_text(DIST_TTL)
    drv = load_turtle(spark, str(p)).collect()
    dist = load_turtle_distributed(spark, str(p)).collect()
    assert _canon(dist) == _canon(drv)
    # multi-line statement (';' continuation) reassembled correctly
    qs = [r for r in dist if r.p_lex == "http://example.org/r"]
    assert sorted(r.o_lex for r in qs) == ["1.5", "2"]
    # "1." = integer 1 + terminator, and PNAME locals may contain dots
    one = [r for r in dist if r.s_lex == "http://example.org/p1.2x"]
    assert len(one) == 1 and one[0].o_lex == "1" and one[0].o_dt == "integer"


def test_turtle_distributed_long_string_trig_midfile(spark, tmp_path):
    """Long strings, TriG graph blocks, and mid-file directives all stay
    on the statement-parallel path (driver fallback patched to raise)."""
    import kineo_spark.sources.turtle as T

    text = (
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p """multi\nline\nwith "quotes" and \'\' inside""" .\n'
        "ex:b ex:p '''second\nlong''' .\n"
        'ex:g1 {\n  ex:s1 ex:q 1 .\n  ex:s2 ex:q 2 .\n}\n'
        'PREFIX late: <http://late.example/>\n'
        '@prefix ex2: <http://ex2.example/> .\n'
        'late:x ex2:r ex:y .\n'
    )
    p = tmp_path / "wide.trig"
    p.write_text(text)
    drv = load_turtle(spark, text).collect()
    orig = T.load_turtle
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        dist = T.load_turtle_distributed(spark, str(p)).collect()
    finally:
        T.load_turtle = orig
    assert _canon(dist) == _canon(drv)
    longs = sorted(r.o_lex for r in dist if r.s_lex.endswith(("/a", "/b")))
    assert longs == ['multi\nline\nwith "quotes" and \'\' inside',
                     "second\nlong"]
    # TriG block quads land in the named graph
    g1 = [r for r in dist if r.g_lex == "http://example.org/g1"]
    assert sorted(int(r.o_lex) for r in g1) == [1, 2]
    # mid-file directives (dotless SPARQL-style and @prefix) resolve
    late = [r for r in dist if r.s_lex == "http://late.example/x"]
    assert len(late) == 1 and late[0].p_lex == "http://ex2.example/r"


def test_turtle_distributed_fallback(spark, tmp_path):
    from kineo_spark.sources.turtle import load_turtle_distributed

    # nested graph blocks are outside the distributed subset: must fall
    # back to the driver parser (which raises the same SyntaxError on
    # truly malformed text — here we use a classifiable-but-unsupported
    # shape: an unterminated short string)
    text = '@prefix ex: <http://example.org/> .\nex:a ex:p "unterminated\nex:b ex:q 1 .\n'
    p = tmp_path / "fb.ttl"
    p.write_text(text)
    import pytest

    with pytest.raises(SyntaxError):
        load_turtle_distributed(spark, str(p)).collect()


def test_turtle_distributed_100k(spark, tmp_path):
    """100k-statement corpus containing bnode property lists ([...]),
    collections ((...)), multi-line statements, multi-line '''long'''
    strings, and TriG graph blocks parses on the STATEMENT-PARALLEL
    path — driver fallback is monkeypatched to raise."""
    import kineo_spark.sources.turtle as T

    n = 100_000
    p = tmp_path / "big.ttl"
    with open(p, "w") as fh:
        fh.write("@prefix ex: <http://example.org/> .\n")
        for i in range(n):
            if i % 20 == 0:  # multi-line bnode property list
                fh.write(
                    f'ex:s{i} ex:knows [\n    ex:name "n{i}" ;\n'
                    f'    ex:q {i}\n] .\n'
                )
            elif i % 20 == 10:  # rdf:List collection
                fh.write(f'ex:s{i} ex:list ({i} {i + 1}) ; ex:q {i} .\n')
            elif i % 20 == 3:  # multi-line long string
                fh.write(f'ex:s{i} ex:p """line one {i}\nline "two"\n{i}""" .\n')
            elif i % 20 == 13:  # TriG graph block (2 inner statements)
                fh.write(f'ex:g{i} {{\n  ex:s{i} ex:p "v{i}" .\n  ex:s{i} ex:q {i} .\n}}\n')
            elif i % 10 == 5:  # every 10th statement spans two lines
                fh.write(f'ex:s{i} ex:p "v{i}" ;\n    ex:q {i} .\n')
            else:
                fh.write(f'ex:s{i} ex:p "v{i}" .\n')
    orig = T.load_turtle
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        df = T.load_turtle_distributed(spark, str(p))
        rows = df.count()
    finally:
        T.load_turtle = orig
    # per bucket of 20: one [..] (2 triples in the bnode + 1 link),
    # one (..) (2-elem rdf:List = 4 triples + 1 link + 1 ex:q),
    # one long-string stmt (1), one TriG block (2),
    # two 2-line stmts of 2 triples, fourteen 1-triple stmts
    assert rows == (n // 20) * (3 + 6 + 1 + 2 + 4 + 14)
    from pyspark.sql import functions as F
    total = df.filter(
        (F.col("o_dt") == "integer")
        & (F.col("p_lex") == "http://example.org/q")
    ).agg(F.sum("o_num")).first()[0]
    assert int(total) == sum(i for i in range(n) if i % 5 == 0 or i % 20 == 13)
    # long strings reassembled bit-exactly across line boundaries
    one = df.filter(F.col("s_lex") == "http://example.org/s3").collect()
    assert one[0].o_lex == 'line one 3\nline "two"\n3'
    # TriG quads landed in their named graphs
    assert df.filter(F.col("g_lex") == "http://example.org/g13").count() == 2


def test_load_rdf_dispatch(spark, tmp_path):
    """Combined format dispatch (RDFParserCombined analog): extension
    routing plus content sniffing for unknown extensions."""
    from kineo_spark.sources import load_rdf

    ttl = '@prefix ex: <http://example.org/> .\nex:a ex:p ex:b .\n'
    nt = '<http://example.org/a> <http://example.org/p> <http://example.org/b> .\n'
    xml = ('<?xml version="1.0"?>\n'
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://example.org/">\n'
           '<rdf:Description rdf:about="http://example.org/a">'
           '<ex:p rdf:resource="http://example.org/b"/>'
           '</rdf:Description>\n</rdf:RDF>\n')
    expect = ("http://example.org/a", "http://example.org/p", "http://example.org/b")

    for name, content in [("d.ttl", ttl), ("d.nt", nt), ("d.rdf", xml),
                          ("noext_ttl", ttl), ("noext_nt", nt), ("noext_xml", xml)]:
        p = tmp_path / name
        p.write_text(content)
        rows = load_rdf(spark, str(p)).collect()
        assert len(rows) == 1, name
        assert (rows[0].s_lex, rows[0].p_lex, rows[0].o_lex) == expect, name


def test_turtle_distributed_directory(spark, tmp_path):
    """Directory inputs: prologue read from the first part file, lines
    indexed across parts in order, statements spanning parts handled."""
    from kineo_spark.sources.turtle import load_turtle_distributed

    (tmp_path / "part-000").write_text(
        "@prefix ex: <http://e/> .\n"
        + "".join(f"ex:a{i} ex:p {i} .\n" for i in range(50)))
    (tmp_path / "part-001").write_text(
        "".join(f"ex:b{i} ex:p {i} ;\n  ex:q {i * 2} .\n" for i in range(50)))
    df = load_turtle_distributed(spark, str(tmp_path))
    assert df.count() == 150
    # a directive in a later part file is mid-file from the corpus view:
    # still statement-parallel (no fallback), scoped to later statements
    import kineo_spark.sources.turtle as T

    (tmp_path / "part-002").write_text(
        "@prefix ex2: <http://f/> .\nex2:x ex2:p ex2:y .\n")
    orig = T.load_turtle
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        df2 = load_turtle_distributed(spark, str(tmp_path))
        assert df2.count() == 151
    finally:
        T.load_turtle = orig


def test_turtle_star_quoted_and_annotation(spark, tmp_path):
    """Turtle-star: << >> quoted terms (subject and object, nested) and
    inline {| |} annotations stay statement-parallel; a multi-line
    annotation takes the documented driver fallback."""
    import kineo_spark.sources.turtle as T
    from kineo_spark.model import PyTerm, quoted_parts

    text = (
        '@prefix ex: <http://example.org/> .\n'
        'ex:alice ex:age 30 .\n'
        '<< ex:alice ex:age 30 >> ex:certainty 0.9 .\n'
        'ex:doc ex:claims << ex:x ex:q << ex:y ex:r ex:z >> >> .\n'
        'ex:bob ex:age 25 {| ex:src ex:census ; ex:conf 0.4 |} .\n'
    )
    p = tmp_path / "star.ttl"
    p.write_text(text)
    drv = load_turtle(spark, text).collect()
    orig = T.load_turtle
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        dist = T.load_turtle_distributed(spark, str(p)).collect()
    finally:
        T.load_turtle = orig
    assert _canon(dist) == _canon(drv)
    # quoted-subject annotation row decodes back to its components
    ann = [r for r in dist if r.p_lex == "http://example.org/certainty"]
    assert len(ann) == 1 and ann[0].s_kind == 3
    s, pr, o = quoted_parts(PyTerm(3, ann[0].s_lex))
    assert (s.lex, pr.lex, o.lex) == (
        "http://example.org/alice", "http://example.org/age", "30")
    # {| |} sugar asserted the base triple AND two annotation triples
    assert any(r.s_lex == "http://example.org/bob" and r.o_lex == "25"
               for r in dist)
    conf = [r for r in dist if r.p_lex == "http://example.org/conf"]
    assert len(conf) == 1 and conf[0].s_kind == 3 and conf[0].o_lex == "0.4"
    # nested quoted object round-trips
    deep = [r for r in dist if r.p_lex == "http://example.org/claims"]
    assert len(deep) == 1 and deep[0].o_kind == 3
    _, _, inner = quoted_parts(PyTerm(3, deep[0].o_lex))
    assert inner.kind == 3

    # r7: multi-line {| |} annotations are STATEMENT-PARALLEL — the FSM
    # carries annotation depth across lines (turtle.py _ALL_STATES), so
    # the fallback (patched to raise here) must not fire. Covers: an
    # annotation block spanning lines, a NESTED annotation spanning
    # lines, and an annotated triple inside a multi-line TriG block.
    p2 = tmp_path / "star2.ttl"
    p2.write_text(
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p 1 {| ex:conf\n'
        ' 0.5 ;\n'
        ' ex:src ex:census |} .\n'
        'ex:b ex:q 2 {| ex:note """multi\n'
        'line""" ; ex:meta 7 {| ex:conf\n'
        ' 0.8 |} |} .\n'
        'ex:g1 {\n'
        '  ex:c ex:r 3 {| ex:conf\n'
        '   0.6 |} .\n'
        '}\n'
        'ex:tail ex:p ex:done .\n')
    orig = T.load_turtle
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        dist2 = T.load_turtle_distributed(spark, str(p2)).collect()
    finally:
        T.load_turtle = orig
    drv2 = load_turtle(spark, p2.read_text()).collect()
    assert _canon(dist2) == _canon(drv2)
    assert sum(1 for r in dist2 if r.s_kind == 3) >= 4
    # the annotated triple inside the TriG block lands in ex:g1
    ing1 = [r for r in dist2 if r.g_lex == "http://example.org/g1"]
    assert any(r.s_kind == 3 for r in ing1)

    # r11 (r8: 2->4, now 4->8 + configurable): multi-line nesting up to
    # the depth-8 default stays STATEMENT-PARALLEL (fallback patched to
    # raise) — machine-generated RDF-star nests deeper than hand-written
    # files, and the FSM state count grows only linearly in the bound.
    def _nested(name, depth):
        opens = " ".join(f"{{| ex:m{i}\n {i}" for i in range(depth))
        return ('@prefix ex: <http://example.org/> .\n'
                f'ex:{name} ex:p 0 {opens} ' + "|} " * depth + ".\n")

    p3 = tmp_path / "star3.ttl"
    p3.write_text(_nested("a", 3) + _nested("b", 4) + _nested("c", 8))
    T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fell back to driver parser"))
    try:
        dist3 = T.load_turtle_distributed(spark, str(p3)).collect()
    finally:
        T.load_turtle = orig
    drv3 = load_turtle(spark, p3.read_text()).collect()
    assert _canon(dist3) == _canon(drv3)

    # depth-9 exceeds the cap and takes the fallback (correct, serial)
    p5 = tmp_path / "star9.ttl"
    p5.write_text(_nested("d", 9))
    dist5 = T.load_turtle_distributed(spark, str(p5)).collect()
    drv5 = load_turtle(spark, p5.read_text()).collect()
    assert _canon(dist5) == _canon(drv5)

    # the bound is configurable: at k=2 a depth-3 file must STILL parse
    # correctly via the documented fallback, and at k=12 the depth-9
    # file goes statement-parallel
    T.set_annot_depth(2)
    try:
        assert _canon(T.load_turtle_distributed(
            spark, str(p3)).collect()) == _canon(drv3)
        T.set_annot_depth(12)
        T.load_turtle = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("fell back to driver parser"))
        try:
            assert _canon(T.load_turtle_distributed(
                spark, str(p5)).collect()) == _canon(drv5)
        finally:
            T.load_turtle = orig
    finally:
        T.set_annot_depth(8)
