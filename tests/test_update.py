"""SPARQL 1.1 Update (extension — the reference declares sparqlUpdate11
but never evaluates it, QueryPlanner.swift:1075-1076): text → ops →
functional quads-DataFrame transforms via GraphStore."""

import pytest

from kineo_spark import algebra as A
from kineo_spark.sparql_parser import parse_update
from kineo_spark.update import GraphStore

EX = "http://example.org/"
PFX = f"PREFIX ex: <{EX}>\n"


@pytest.fixture()
def gs(spark):
    return GraphStore(spark).update(
        PFX + "INSERT DATA { ex:a ex:p ex:b . ex:b ex:p ex:c . "
        'ex:a ex:name "Alice" }'
    )


def _rows(gs_):
    return {
        (r["s_lex"], r["p_lex"], r["o_lex"], r["g_lex"])
        for r in gs_.quads.collect()
    }


def test_insert_and_delete_data(gs):
    assert (EX + "a", EX + "p", EX + "b", "urn:g:default") in _rows(gs)
    gs.update(PFX + "DELETE DATA { ex:a ex:p ex:b }")
    got = _rows(gs)
    assert (EX + "a", EX + "p", EX + "b", "urn:g:default") not in got
    assert (EX + "b", EX + "p", EX + "c", "urn:g:default") in got


def test_insert_data_is_set_semantics(gs):
    n = gs.quads.count()
    gs.update(PFX + "INSERT DATA { ex:a ex:p ex:b }")  # already present
    assert gs.quads.count() == n


def test_graph_scoped_insert_and_clear(gs):
    gs.update(PFX + "INSERT DATA { GRAPH ex:g1 { ex:a ex:p ex:z } }")
    assert (EX + "a", EX + "p", EX + "z", EX + "g1") in _rows(gs)
    # queryable through GRAPH
    res = gs.query(PFX + "SELECT ?o WHERE { GRAPH ex:g1 { ex:a ex:p ?o } }")
    assert [r["o"]["lex"] for r in res.bindings.collect()] == [EX + "z"]
    gs.update(PFX + "CLEAR GRAPH ex:g1")
    assert (EX + "a", EX + "p", EX + "z", EX + "g1") not in _rows(gs)
    # default graph untouched
    assert (EX + "b", EX + "p", EX + "c", "urn:g:default") in _rows(gs)


def test_clear_default_and_all(gs):
    gs.update(PFX + "INSERT DATA { GRAPH ex:g1 { ex:a ex:p ex:z } }")
    gs.update("CLEAR DEFAULT")
    got = _rows(gs)
    assert got == {(EX + "a", EX + "p", EX + "z", EX + "g1")}
    gs.update("CLEAR ALL")
    assert gs.quads.count() == 0


def test_modify_rename_predicate(gs):
    gs.update(
        PFX + "DELETE { ?s ex:p ?o } INSERT { ?s ex:q ?o } "
        "WHERE { ?s ex:p ?o }"
    )
    got = _rows(gs)
    assert (EX + "a", EX + "q", EX + "b", "urn:g:default") in got
    assert (EX + "b", EX + "q", EX + "c", "urn:g:default") in got
    assert not [r for r in got if r[1] == EX + "p"]
    # non-matching triples untouched
    assert (EX + "a", EX + "name", "Alice", "urn:g:default") in got


def test_modify_swap_uses_prestate(gs):
    # classic: swap direction; bindings must come from the PRE-state,
    # not be re-derived while inserting
    gs.update(
        PFX + "DELETE { ?s ex:p ?o } INSERT { ?o ex:p ?s } "
        "WHERE { ?s ex:p ?o }"
    )
    got = _rows(gs)
    assert (EX + "b", EX + "p", EX + "a", "urn:g:default") in got
    assert (EX + "c", EX + "p", EX + "b", "urn:g:default") in got
    assert (EX + "a", EX + "p", EX + "b", "urn:g:default") not in got


def test_delete_where_shorthand(gs):
    gs.update(PFX + "DELETE WHERE { ?s ex:p ?o }")
    got = _rows(gs)
    assert len(got) == 1 and next(iter(got))[1] == EX + "name"


def test_insert_where_with_filter(gs):
    gs.update(
        PFX + 'INSERT { ?s ex:long "yes" } '
        "WHERE { ?s ex:name ?n FILTER(STRLEN(?n) > 3) }"
    )
    assert (EX + "a", EX + "long", "yes", "urn:g:default") in _rows(gs)


def test_insert_graph_template_var(gs):
    # copy default-graph ex:p edges into a per-subject graph
    gs.update(
        PFX + "INSERT { GRAPH ?s { ?s ex:p ?o } } WHERE { ?s ex:p ?o }"
    )
    assert (EX + "a", EX + "p", EX + "b", EX + "a") in _rows(gs)


def test_with_graph_scoping(gs):
    gs.update(PFX + "INSERT DATA { GRAPH ex:g1 { ex:a ex:p ex:b } }")
    # WITH: WHERE reads g1 and the un-GRAPHed template writes to g1
    gs.update(
        PFX + "WITH ex:g1 DELETE { ?s ex:p ?o } INSERT { ?o ex:p ?s } "
        "WHERE { ?s ex:p ?o }"
    )
    got = _rows(gs)
    assert (EX + "b", EX + "p", EX + "a", EX + "g1") in got
    assert (EX + "a", EX + "p", EX + "b", EX + "g1") not in got
    # default graph untouched by the WITH-scoped WHERE
    assert (EX + "a", EX + "p", EX + "b", "urn:g:default") in got


def test_fresh_bnodes_per_solution(gs):
    gs.update(PFX + "INSERT { ?s ex:tag _:t } WHERE { ?s ex:p ?o }")
    tags = [
        r for r in gs.quads.collect()
        if r["p_lex"] == EX + "tag"
    ]
    assert len(tags) == 2  # one per solution
    assert len({r["o_lex"] for r in tags}) == 2  # distinct fresh labels
    assert all(r["o_kind"] == 1 for r in tags)


def test_unbound_template_var_skipped(gs):
    # OPTIONAL leaves ?x unbound for every row → no quads produced
    n = gs.quads.count()
    gs.update(
        PFX + "INSERT { ?s ex:opt ?x } "
        "WHERE { ?s ex:p ?o OPTIONAL { ?s ex:missing ?x } }"
    )
    assert gs.quads.count() == n


def test_literal_subject_skipped(gs):
    n = gs.quads.count()
    gs.update(PFX + "INSERT { ?n ex:len 1 } WHERE { ?s ex:name ?n }")
    assert gs.quads.count() == n


def test_sequence_and_semicolons(spark):
    gs_ = GraphStore(spark).update(
        PFX + "INSERT DATA { ex:a ex:p ex:b } ; "
        "INSERT DATA { ex:b ex:p ex:c } ; "
        "DELETE DATA { ex:a ex:p ex:b }"
    )
    assert _rows(gs_) == {(EX + "b", EX + "p", EX + "c", "urn:g:default")}


def test_load_ntriples(spark, tmp_path):
    p = tmp_path / "data.nt"
    p.write_text(
        f"<{EX}x> <{EX}p> <{EX}y> .\n<{EX}y> <{EX}p> \"lit\" .\n")
    gs_ = GraphStore(spark).update(f"LOAD <file://{p}> INTO GRAPH <{EX}g>")
    got = _rows(gs_)
    assert (EX + "x", EX + "p", EX + "y", EX + "g") in got
    assert (EX + "y", EX + "p", "lit", EX + "g") in got
    # SILENT swallows a missing file; non-SILENT raises
    gs_.update("LOAD SILENT <file:///nonexistent.nt>")
    with pytest.raises(Exception):
        gs_.update("LOAD <file:///nonexistent.nt>")


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse_update("INSERT DATA { ?s <urn:p> 1 }")  # var in DATA
    with pytest.raises(SyntaxError):
        parse_update(
            "DELETE { _:b <urn:p> 1 } WHERE { ?s <urn:p> 1 }")  # bnode in DELETE
    ops = parse_update(
        "CREATE GRAPH <urn:g:x> ; DROP SILENT NAMED ; CLEAR ALL")
    assert isinstance(ops[0], A.Create)
    assert isinstance(ops[1], A.Clear) and ops[1].silent and ops[1].target == "NAMED"
    assert isinstance(ops[2], A.Clear) and ops[2].target == "ALL"
