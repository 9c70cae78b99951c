"""Custom window functions (extension — the reference throws on custom
windows, MaterializedQueryPlan.swift:942-943): registry dispatch, the
built-in GEOMETRIC_MEAN/MEDIAN customs, and a pandas GROUPED_AGG UDF
registered as a window function (the Arrow-batched path)."""

import math

import pytest
from pyspark.sql import functions as F

from kineo_spark import algebra as A
from kineo_spark.engine import Engine
from kineo_spark.expr import v
from kineo_spark.forms import select
from kineo_spark.compiler import Compiler
from kineo_spark.store import QuadsDataFrameStore
from kineo_spark.windows import register_window_function
from kineo_spark.expr import is_numeric_term, num_term


@pytest.fixture(scope="module")
def store(spark):
    G = "urn:g:default"
    rows = []
    vals = {"a": [2.0, 8.0], "b": [1.0, 3.0, 9.0]}
    i = 0
    for grp, xs in vals.items():
        for x in xs:
            rows.append((0, f"urn:r{i}", "urn:grp", 2, grp, "string", None, None, G))
            rows.append((0, f"urn:r{i}", "urn:val", 2, str(x), "double", None, x, G))
            i += 1
    return QuadsDataFrameStore.from_rows(spark, rows)


def _window_alg(op):
    from kineo_spark.model import iri

    return A.Window(
        A.BGP((
            A.TriplePattern(A.Var("s"), iri("urn:grp"), A.Var("g")),
            A.TriplePattern(A.Var("s"), iri("urn:val"), A.Var("x")),
        )),
        functions=(("w", A.WindowSpec(op, expr=v("x"), partition=(v("g"),))),),
    )


def _collect(store, op):
    comp = Compiler(store)
    df = select(comp, A.SelectQuery(_window_alg(op), ("g", "x", "w")))
    return [(r["g"]["lex"], r["x"]["num"], r["w"]["num"]) for r in df.collect()]


def test_geometric_mean_window(spark, store):
    got = _collect(store, "GEOMETRIC_MEAN")
    for g, _, w in got:
        expect = {"a": math.sqrt(2.0 * 8.0), "b": (1.0 * 3.0 * 9.0) ** (1 / 3)}[g]
        assert abs(w - expect) < 1e-9


def test_median_window(spark, store):
    got = _collect(store, "MEDIAN")
    for g, _, w in got:
        assert w == {"a": 5.0, "b": 3.0}[g]


def test_pandas_grouped_agg_custom_window(spark, store):
    """A pandas GROUPED_AGG UDF (Arrow-batched, runs in Python) plugs
    into the same registry and frame machinery."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def midrange(x: pd.Series) -> float:
        return (x.min() + x.max()) / 2.0

    def _w_midrange(spec, value, wf):
        num = F.when(is_numeric_term(value), value["num"])
        return num_term(midrange(num).over(wf).cast("double"), F.lit("double"))

    register_window_function("MIDRANGE", _w_midrange)
    got = _collect(store, "MIDRANGE")
    for g, _, w in got:
        assert w == {"a": 5.0, "b": 5.0}[g]


def test_unknown_window_still_raises(spark, store):
    with pytest.raises(Exception):
        _collect(store, "NO_SUCH_WINDOW_FN")


def test_count_star_window_partition(spark, store):
    """COUNT(*) OVER (PARTITION BY ?g) — r10 fuzz regression: the spec
    has NO operand expression and compile_window previously crashed
    compiling the None expr. Each row gains its partition's size."""
    from kineo_spark.model import iri

    alg = A.Window(
        A.BGP((A.TriplePattern(A.Var("s"), iri("urn:grp"), A.Var("g")),)),
        functions=(("w", A.WindowSpec("COUNT*", partition=(v("g"),))),),
    )
    comp = Compiler(store)
    df = select(comp, A.SelectQuery(alg, ("g", "w")))
    got = {(r["g"]["lex"], r["w"]["lex"]) for r in df.collect()}
    assert got == {("a", "2"), ("b", "3")}
