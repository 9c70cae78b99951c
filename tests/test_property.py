"""Property-based tests (hypothesis) — driver-side, no Spark session:
term n3() serialization roundtrips through the Turtle parser, and
PyTerm keys are injective on distinct terms."""

from hypothesis import given, settings, strategies as st

from kineo_spark.model import KIND_LITERAL, PyTerm, iri, lit
from kineo_spark.sources.turtle import TurtleParser

# lexical forms that survive the escape/unescape path
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), blacklist_characters='"\\\n\r\t'),
    min_size=0, max_size=40,
)
_iri_str = st.from_regex(r"http://example\.org/[A-Za-z0-9_./-]{0,30}", fullmatch=True)
_lang = st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,4})?", fullmatch=True)


def term_strategy():
    return st.one_of(
        _iri_str.map(iri),
        _text.map(lambda s: PyTerm(KIND_LITERAL, s, "string")),
        st.integers(min_value=-10**12, max_value=10**12).map(lit),
        st.booleans().map(lit),
        st.tuples(_text, _lang).map(lambda t: PyTerm(KIND_LITERAL, t[0], "langString", t[1])),
    )


@settings(max_examples=100, deadline=None)
@given(term_strategy())
def test_n3_roundtrips_through_turtle(o):
    doc = f"<http://example.org/s> <http://example.org/p> {o.n3()} ."
    quads = TurtleParser(doc).parse()
    assert len(quads) == 1
    (_, _, _, o_kind, o_lex, o_dt, o_lang, _, _) = quads[0]
    assert o_kind == o.kind
    assert o_lex == o.lex
    if o.kind == KIND_LITERAL:
        assert (o_dt or "string") == (o.dt or "string")
        assert o_lang == o.lang


@settings(max_examples=100, deadline=None)
@given(term_strategy(), term_strategy())
def test_term_key_injective(a, b):
    if (a.kind, a.lex, a.dt, a.lang) != (b.kind, b.lex, b.dt, b.lang):
        assert a.key() != b.key()
    else:
        assert a.key() == b.key()


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=-10**9, max_value=10**9))
def test_numeric_shadow_matches_lexical(n):
    t = lit(n)
    assert t.num == float(n)
    assert t.lex == str(n)


# -- SPARQL text roundtrip: algebra -> serialize -> parse -> same shape ----

_var = st.sampled_from(["s", "o", "x", "y"])


def _tp_strategy():
    from kineo_spark import algebra as A

    node = st.one_of(_var.map(A.Var), _iri_str.map(iri),
                     st.integers(min_value=0, max_value=99).map(lit))
    return st.tuples(st.one_of(_var.map(A.Var), _iri_str.map(iri)),
                     _iri_str.map(iri), node).map(
        lambda t: A.TriplePattern(*t))


@settings(max_examples=100, deadline=None)
@given(st.lists(_tp_strategy(), min_size=1, max_size=4))
def test_bgp_roundtrips_through_sparql_text(tps):
    """algebra → SPARQL text (sparql_text serializer, also the SERVICE
    wire format) → parser → the same BGP triples."""
    from kineo_spark import algebra as A
    from kineo_spark.sparql_text import algebra_to_sparql
    from kineo_spark.sparql_parser import parse_query

    bgp = A.BGP(tuple(tps))
    q = parse_query(algebra_to_sparql(bgp))

    def collect(n, out):
        if isinstance(n, A.BGP):
            out.extend(n.patterns)
        elif isinstance(n, (A.Triple,)):
            out.append(n.pattern)
        else:
            import dataclasses
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if isinstance(v, A.Algebra):
                    collect(v, out)
    got: list = []
    collect(q.algebra, got)
    assert sorted(map(repr, got)) == sorted(map(repr, tps))
