"""Differential pin for the r7 computed-IN hoist (expr.hoist_scope):
the SAME expression must produce identical rows through the two hoisted
code paths — FILTER position (Filter._filter scope) and BIND position
(Extend scope, then FILTER(?b)) — and both must equal the hand-computed
SPARQL §17.4.1.9 semantics ("true beats error beats false"; error drops
the row in FILTER). Covers computed branches, constant/computed error
branches, unbound lhs, string constructors, single-branch IN, and IN
under ||."""

import pytest


@pytest.fixture(scope="module")
def store(spark):
    from kineo_spark.store import QuadsDataFrameStore

    G = "urn:g:default"
    P = "urn:p:name"
    Q = "urn:p:opt"
    rows = [
        (0, "urn:s1", P, 2, "aa", "string", None, None, G),
        (0, "urn:s2", P, 2, "abc", "string", None, None, G),
        (0, "urn:s3", P, 2, "abcd", "string", None, None, G),
        (0, "urn:s4", P, 2, "zzzzz", "string", None, None, G),
        (0, "urn:s1", Q, 2, "2", "integer", None, 2.0, G),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


# (expression over ?name / ?opt, expected surviving names)
CASES = [
    # plain constants (or-chain fast path in FILTER, fold in BIND)
    ("STRLEN(?name) IN (2, 3)", {"aa", "abc"}),
    ("STRLEN(?name) NOT IN (2, 3)", {"abcd", "zzzzz"}),
    # computed branches -> hoisted columns
    ("STRLEN(?name) IN ((STRLEN(?name) + 1) - 1, 99)",
     {"aa", "abc", "abcd", "zzzzz"}),
    ("STRLEN(?name) NOT IN ((STRLEN(?name) * 2) / 2, 99)", set()),
    # constant error branch: true beats error; error beats false
    ("STRLEN(?name) IN (1/0, 2)", {"aa"}),
    ("STRLEN(?name) NOT IN (1/0, 2)", set()),
    # computed per-row error branch
    ("STRLEN(?name) IN (STRLEN(?name)/0, 3)", {"abc"}),
    # string constructor branch
    ('?name IN (CONCAT("a", "a"), "abc")', {"aa", "abc"}),
    # single-branch IN under ||
    ("STRLEN(?name) IN (2) || STRLEN(?name) IN (3)", {"aa", "abc"}),
    # unbound lhs -> error -> drop (only s1 binds ?opt)
    ("?opt IN (STRLEN(?name), 99)", {"aa"}),
]


def _names(result):
    return {r["name"]["lex"] for r in result.bindings.collect()}


@pytest.mark.parametrize("expr,expected", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_filter_and_bind_paths_agree(store, expr, expected):
    from kineo_spark.engine import Engine

    eng = Engine(store)
    body = ("?s <urn:p:name> ?name . "
            "OPTIONAL { ?s <urn:p:opt> ?opt }")
    via_filter = eng.query(
        f"SELECT ?name WHERE {{ {body} FILTER({expr}) }}")
    via_bind = eng.query(
        f"SELECT ?name WHERE {{ {body} BIND(({expr}) AS ?b) FILTER(?b) }}")
    assert _names(via_filter) == expected
    assert _names(via_bind) == expected
