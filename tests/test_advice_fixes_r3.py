"""Round-6 regression tests for the round-5 ADVICE findings:

1. Whitespace-free SPARQL-style ``BASE<iri>`` must end a statement and
   enter the directive snapshot fold (both regexes previously required
   ``base\\s``, so later chunks silently resolved against a stale base).
2. A >=6 quote run inside a long string is NOT consumed entirely as the
   closer: maximal-munch lexing takes <=2 content quotes + exactly 3
   closer quotes and re-lexes the remainder outside the string.
3. ``scan_ids(remap=..., key_bits=128)`` fails loudly (the repair table
   holds 64-bit longs; comparing them to struct ids is invalid).
4. The distributed Turtle loader reads the raw input ONCE after pass 1
   (stmts is persisted and forced before the line cache is dropped).
"""

import pytest

from kineo_spark.sources.turtle import load_turtle


def _canon(rows):
    out = []
    for r in rows:
        s_lex = "_b_" if r.s_kind == 1 else r.s_lex
        o_lex = "_b_" if r.o_kind == 1 else r.o_lex
        out.append((r.s_kind, s_lex, r.p_lex, r.o_kind, o_lex, r.o_dt,
                    r.o_lang, r.o_num, r.g_lex))
    return sorted(out)


def test_whitespace_free_base_directive(spark, tmp_path):
    """BASE<iri> (no whitespace — '<' is a delimiter, so this lexes as
    KW + IRIREF) must re-base all later relative IRIs on the
    statement-parallel path, identically to the driver parser."""
    import kineo_spark.sources.turtle as T

    text = (
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p ex:o .\n'
        'BASE<http://newbase.example/>\n'
        '<rel> ex:p <rel2> .\n'
        'base<http://lower.example/>\n'
        '<tail> ex:q 1 .\n'
    )
    p = tmp_path / "basedir.ttl"
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
    subj = sorted(r.s_lex for r in dist)
    assert "http://newbase.example/rel" in subj
    assert "http://lower.example/tail" in subj
    # and the pre-directive statement kept the old environment
    assert "http://example.org/a" in subj


def test_scan_line_quote_run_relexed():
    """A >=3 quote run inside a long string closes after EXACTLY 3
    quotes (the driver tokenizer's non-greedy '''…''' regex and the W3C
    grammar agree: content cannot end in a quote); the remainder is
    re-lexed outside the string instead of being swallowed as part of
    the closer."""
    from kineo_spark.sources.turtle import _START_STATE, _scan_line

    # r=6: close + immediately reopen a long string → line ends INSIDE
    # a long string (old code consumed all 6 as the closer and ended
    # the line outside, drifting every later statement boundary)
    st, ends, bad = _scan_line("x '''a''''''", _START_STATE)
    assert st == ("'", 0) and not ends and bad is None

    # r=4: leftover single quote opens a short string that never closes
    # → classified unsupported → documented driver fallback
    st, ends, bad = _scan_line("x '''a''''", _START_STATE)
    assert bad == "unterminated string"

    # r=5: leftover '' is an empty short string; the trailing dot still
    # ends the statement
    st, ends, bad = _scan_line("x '''a''''' y .", _START_STATE)
    assert st == _START_STATE and ends and bad is None

    # r=9 after content: close, reopen, close again → outside
    st, ends, bad = _scan_line("x '''a''''''''' .", _START_STATE)
    assert st == _START_STATE and ends and bad is None


def test_long_string_quote_run_eof_clean_error(spark, tmp_path):
    """File ending in a 6-quote run: the reopened long string hits EOF
    → clean driver fallback → the driver's SyntaxError (old code
    classified the file as fully closed and crashed inside the
    executor-side chunk parse instead)."""
    from kineo_spark.sources.turtle import load_turtle_distributed

    text = (
        "@prefix ex: <http://example.org/> .\n"
        "ex:s ex:p '''a''''''\n"
    )
    with pytest.raises(SyntaxError):
        load_turtle(spark, text).collect()
    p = tmp_path / "qrun.ttl"
    p.write_text(text)
    with pytest.raises(SyntaxError):
        load_turtle_distributed(spark, str(p)).collect()


def test_scan_ids_remap_requires_64_bit(spark):
    from kineo_spark import algebra as A
    from kineo_spark.dictionary import scan_ids
    from kineo_spark.model import iri

    df = spark.range(0).selectExpr(
        "named_struct('hi', id, 'lo', id) as s",
        "named_struct('hi', id, 'lo', id) as p",
        "named_struct('hi', id, 'lo', id) as o",
        "named_struct('hi', id, 'lo', id) as g",
    )
    pat = A.QuadPattern(
        A.Var("s"), iri("http://example.org/p"),
        A.Var("o"), A.Var("g"))
    with pytest.raises(ValueError, match="key_bits=64"):
        scan_ids(df, pat, remap={("i", "http://x", "", ""): 7},
                 key_bits=128)


def test_distributed_turtle_single_input_read(spark, tmp_path):
    """After the summary pass, the raw input is read exactly once more
    (the stmts materialization, forced inside the loader) — the
    directive scan and the final mapInPandas parse must hit the
    persisted stmts relation, not re-scan the file."""
    import kineo_spark.sources.turtle as T

    text = "".join(
        f"<http://e/s{i}> <http://e/p> {i} .\n" for i in range(200))
    p = tmp_path / "onepass.ttl"
    p.write_text(text)
    df = T.load_turtle_distributed(spark, str(p))
    plan = df._jdf.queryExecution().toString()
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan
    assert df.count() == 200
