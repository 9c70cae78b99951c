"""Regression tests for the round-1 ADVICE findings:

1. PSeq path expansion must join on the midpoint (was: '__mid' internal
   prefix made the join a cross product).
2. Object list ',' after a path predicate must repeat the PATH, not a
   stale simple predicate (was: UnboundLocalError / silent wrong attach).
3. Turtle string unescape must not corrupt non-ASCII (was:
   unicode_escape Latin-1 mangling).
4. N-Triples unescape must be single-pass ('\\\\n' is backslash+'n',
   not newline) and decode \\uXXXX / \\UXXXXXXXX.
5. SUM/AVG empty-multiset = 0, error value in group → unbound.
"""

import pytest

from kineo_spark.engine import Engine
from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"
G = "urn:g:default"

PFX = f"PREFIX ex: <{EX}>\n"


def _iri_quad(s, p, o):
    return (0, EX + s, EX + p, 0, EX + o, None, None, None, G)


@pytest.fixture(scope="module")
def chain_store(spark):
    # a -p-> b -q-> c  plus two more p-edges and two more q-edges so a
    # cross product (3 p-subjects × 3 q-objects = 9) is distinguishable
    # from the correct single join row per connected pair.
    rows = [
        _iri_quad("a", "p", "b"), _iri_quad("b", "q", "c"),
        _iri_quad("d", "p", "e"), _iri_quad("e", "q", "f"),
        _iri_quad("g", "p", "h"),  # h has no q-edge
        _iri_quad("h", "r", "i"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def _names(rows, *cols):
    return {tuple(r[c]["lex"].rsplit("/", 1)[-1] for c in cols) for r in rows}


def test_engine_seq_path_joins_on_midpoint(chain_store):
    rows = Engine(chain_store).query(
        PFX + "SELECT ?s ?o WHERE { ?s ex:p/ex:q ?o }"
    ).bindings.collect()
    assert _names(rows, "s", "o") == {("a", "c"), ("d", "f")}
    assert len(rows) == 2  # not the 3x3 cross product
    # midpoint var must not leak into the projection
    assert {c for c in rows[0].asDict()} == {"s", "o"}


def test_engine_seq_path_three_steps(chain_store):
    rows = Engine(chain_store).query(
        PFX + "SELECT ?o WHERE { ex:g ex:p/ex:r ?o }"
    ).bindings.collect()
    assert _names(rows, "o") == {("i",)}


def test_parser_object_list_after_path(chain_store):
    # ',' after a path predicate repeats the PATH for each object
    rows = Engine(chain_store).query(
        PFX + "SELECT ?s WHERE { ?s ex:p/ex:q ex:c , ex:f }"
    ).bindings.collect()
    assert rows == []  # no subject reaches BOTH c and f
    rows = Engine(chain_store).query(
        PFX + "SELECT ?s WHERE { ?s ex:p/ex:q ex:c }"
    ).bindings.collect()
    assert _names(rows, "s") == {("a",)}


def test_parser_object_list_after_path_with_prior_predicate(chain_store):
    # '?s ex:p ?a ; ex:p/ex:q ?b , ?c' — the comma object binds via the
    # path, NOT the earlier simple predicate ex:p
    rows = Engine(chain_store).query(
        PFX + "SELECT ?s ?a ?b ?c WHERE { ?s ex:p ?a ; ex:p/ex:q ?b , ?c }"
    ).bindings.collect()
    got = _names(rows, "s", "a", "b", "c")
    assert got == {("a", "b", "c", "c"), ("d", "e", "f", "f")}


def test_turtle_unicode_with_escape(spark):
    from kineo_spark.sources.turtle import load_turtle

    ttl = '@prefix ex: <http://example.org/> .\n' \
          'ex:s ex:note "café \\n line" ; ex:uesc "A\\u00e9\\U0001F600" .\n'
    quads = load_turtle(spark, ttl)
    lex = {r["p_lex"].rsplit("/", 1)[-1]: r["o_lex"] for r in quads.collect()}
    assert lex["note"] == "café \n line"
    assert lex["uesc"] == "Aé\U0001F600"


def test_ntriples_unescape_single_pass(spark, tmp_path):
    from kineo_spark.sources.ntriples import load_ntriples

    nt = "\n".join([
        # \\n = escaped backslash then literal 'n' — NOT a newline
        '<http://e/s> <http://e/bs> "back\\\\nslash" .',
        '<http://e/s> <http://e/nl> "line1\\nline2" .',
        '<http://e/s> <http://e/u4> "\\u0041\\u00e9" .',
        '<http://e/s> <http://e/u8> "\\U0001F600" .',
        '<http://e/s> <http://e/sp> "\\ud83d\\ude00" .',  # surrogate pair
    ])
    f = tmp_path / "esc.nt"
    f.write_text(nt)
    rows = {r["p_lex"].rsplit("/", 1)[-1]: r["o_lex"]
            for r in load_ntriples(spark, str(f)).collect()}
    assert rows["bs"] == "back\\nslash"
    assert rows["nl"] == "line1\nline2"
    assert rows["u4"] == "Aé"
    assert rows["u8"] == "\U0001F600"
    assert rows["sp"] == "\U0001F600"


def test_ntriples_roundtrip_with_backslash_n(spark, tmp_path):
    from kineo_spark.sources.ntriples import load_ntriples, serialize_ntriples

    nt = '<http://e/s> <http://e/p> "a\\\\nb\\tc\\rd" .'
    f = tmp_path / "rt.nt"
    f.write_text(nt)
    q1 = load_ntriples(spark, str(f))
    line = serialize_ntriples(q1).collect()[0]["line"]
    f2 = tmp_path / "rt2.nt"
    f2.write_text(line)
    assert load_ntriples(spark, str(f2)).collect()[0]["o_lex"] == \
        q1.collect()[0]["o_lex"] == "a\\nb\tc\rd"


def test_avg_empty_is_zero(fixture_store):
    rows = Engine(fixture_store).query(
        PFX + "SELECT (AVG(?v) AS ?a) (SUM(?v) AS ?t) WHERE { ?s ex:nosuch ?v }"
    ).bindings.collect()
    assert len(rows) == 1
    assert rows[0]["a"]["num"] == 0.0 and rows[0]["a"]["dt"] == "integer"
    assert rows[0]["t"]["num"] == 0.0 and rows[0]["t"]["dt"] == "integer"


def test_sum_with_non_numeric_is_unbound(fixture_store):
    # foaf:name values are strings: numeric-add errors → aggregate unbound
    rows = Engine(fixture_store).query(
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n"
        "SELECT (SUM(?n) AS ?t) (AVG(?n) AS ?a) WHERE { ?s foaf:name ?n }"
    ).bindings.collect()
    assert len(rows) == 1
    assert rows[0]["t"] is None and rows[0]["a"] is None


def test_sum_numeric_groups_unaffected(fixture_store):
    rows = Engine(fixture_store).query(
        PFX + "SELECT (SUM(?v) AS ?t) WHERE { ?s ex:value ?v }"
    ).bindings.collect()
    assert rows[0]["t"]["num"] == pytest.approx(32.7 - 118.0)


def test_ntriples_star_branch_escapes_cr(spark, tmp_path):
    """r9: the STAR serializer branch goes through PyTerm.n3(), which
    did not escape CR — a literal containing '\\r' broke the line
    framing of the N-Triples sink (the JVM plain branch escaped it).
    Round-trip a quoted-triple annotation whose object literal carries
    CR, LF and a raw TAB (tab is legal raw in N-Triples)."""
    from kineo_spark.sources.ntriples import load_ntriples, serialize_ntriples

    nt = '<< <http://e/s> <http://e/p> "x" >> <http://e/q> "a\\rb\\nc\td" .'
    f = tmp_path / "star.nt"
    f.write_text(nt)
    q1 = load_ntriples(spark, str(f))
    line = serialize_ntriples(q1).collect()[0]["line"]
    assert "\r" not in line and "\n" not in line  # framing intact
    f2 = tmp_path / "star2.nt"
    f2.write_text(line)
    assert load_ntriples(spark, str(f2)).collect()[0]["o_lex"] == \
        q1.collect()[0]["o_lex"] == "a\rb\nc\td"
