"""Plan-quality regression suite: pins the SCALE properties of the
compiled plans — the things that make a query survive 100 TB — so a
refactor can't silently regress them.

Checked per query family:
- no BroadcastNestedLoopJoin / CartesianProduct where an equi-join is
  expected (the non-equi cliff, VERDICT r1 'what's wrong' #5);
- predicate pushdown reaches the parquet FileScan (PushedFilters);
- aggregates run partial+final (map-side combine), not single-phase.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Executed-plan string with metadata truncation lifted: the default
    spark.sql.maxMetadataStringLength=100 cuts PushedFilters lists mid-
    entry, so a pushdown assert could fail merely because MORE filters
    pushed (r8: the FILTER conjunct split pushed extra predicates ahead
    of the asserted one)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry
    return entry.queries()


def test_bgp_join_is_equi_join(spark, queries):
    plan = _plan(queries["sparql_bgp_3hop_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_optional_join_is_equi_join(spark, queries):
    plan = _plan(queries["sparql_optional_leftjoin"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minus_is_anti_equi_join(spark, queries):
    plan = _plan(queries["sparql_minus"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_filter_reaches_parquet_scan(spark, queries):
    plan = _plan(queries["sparql_filter_order_limit"](spark, SF))
    assert "PushedFilters: [" in plan
    # the acctbal range predicate must be IN the pushed list, not only
    # in a post-scan Filter
    assert "GreaterThan(c_acctbal" in plan or "LessThan(c_acctbal" in plan


def test_aggregate_is_partial_final(spark, queries):
    plan = _plan(queries["sparql_agg_q1"](spark, SF))
    # decimal-exact accumulators compile to SortAggregate; either way
    # there must be a partial (map-side) phase before the exchange
    n_agg = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_agg >= 2 and "partial_" in plan


def test_topk_uses_take_ordered(spark, queries):
    plan = _plan(queries["sparql_filter_order_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_dedup_ops_have_no_cross_join(spark, queries):
    for name in ("pipe_dedup_minhash_lsh", "pipe_dedup_ngram_jaccard"):
        plan = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_knn_broadcasts_query_side(spark, queries):
    plan = _plan(queries["pipe_knn_bruteforce"](spark, SF))
    assert "BroadcastExchange" in plan


def test_id_mode_native_store_filter_reaches_scan(spark, queries):
    """ID mode over a native-scan store (star-collapse + hash-at-scan):
    string predicates reach the parquet scan like term mode — no
    dictionary semi-join detour, no dictionary encode pass at all."""
    plan = _plan(queries["sparql_id_expr_strings"](spark, SF))
    assert "LeftSemi" not in plan
    assert "PushedFilters: [" in plan


def test_count_star_stats_no_quads_scan(spark, queries):
    """Stats-driven COUNT-star shortcut (DiomedeQuadStore.swift:14-97):
    the final plan is a constant local table — no parquet scan at all."""
    df = queries["sparql_count_star_stats"](spark, SF)
    plan = _plan(df)
    assert "FileScan" not in plan
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    # and it is the right constant
    import duckdb
    exp = duckdb.sql(f"SELECT count(*) FROM '{SF}/customer.parquet'").fetchone()[0]
    assert df.collect()[0]["n"] == exp


def test_count_star_stats_semantics(spark, fixture_store):
    """Driver-side characteristic-set arithmetic: COUNT(*) multiplies
    per-predicate multiplicities; COUNT(DISTINCT subject) sums subject
    counts; non-uniform multiplicity declines (returns None)."""
    from kineo_spark.stats import CharacteristicSets

    import pyspark.sql.functions as F
    from kineo_spark.store import QuadsDataFrameStore

    EX = "http://example.org/"
    G = "urn:g:default"
    rows = [
        # s1: p×2, q×1 ; s2: p×1, q×1  (same CS {p,q}, non-uniform p)
        (0, EX + "s1", EX + "p", 0, EX + "a", None, None, None, G),
        (0, EX + "s1", EX + "p", 0, EX + "b", None, None, None, G),
        (0, EX + "s1", EX + "q", 0, EX + "c", None, None, None, G),
        (0, EX + "s2", EX + "p", 0, EX + "d", None, None, None, G),
        (0, EX + "s2", EX + "q", 0, EX + "e", None, None, None, G),
        # s3: only q (different CS)
        (0, EX + "s3", EX + "q", 0, EX + "f", None, None, None, G),
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    cs = CharacteristicSets(store)
    # q alone: uniform (1 per subject) → 2 + 1 = 3 rows
    assert cs.count_star([EX + "q"], None) == 3
    # p is non-uniform within its CS → decline
    assert cs.count_star([EX + "p"], None) is None
    # DISTINCT subject is always exact
    assert cs.count_star([EX + "p", EX + "q"], None,
                         distinct_subject=True) == 2
    assert cs.count_star([EX + "q"], None, distinct_subject=True) == 3


def test_characteristic_sets_collect_cap(spark):
    """Pathological corpus (near-unique predicate set per subject): the
    driver-side collect is capped — stats fall back to a top-N-by-support
    sample, the exact count-star shortcut DECLINES (None, so the normal
    plan answers), and the estimator still returns sane numbers."""
    from kineo_spark.stats import CharacteristicSets
    from kineo_spark.store import QuadsDataFrameStore
    from kineo_spark import algebra as A

    EX = "http://example.org/"
    G = "urn:g:default"
    rows = []
    for s in range(40):  # 40 subjects, each with a unique 3-predicate set
        for j in range(3):
            rows.append((0, f"{EX}s{s}", f"{EX}p{s}_{j}", 0, f"{EX}o{s}{j}",
                         None, None, None, G))
    store = QuadsDataFrameStore.from_rows(spark, rows)
    cs = CharacteristicSets(store, max_rows=30)  # 120 per_cs rows > cap
    assert cs._exact is False
    assert len(cs._sets) <= 40
    assert cs.count_star([EX + "p0_0"], None) is None
    assert cs.count_star([EX + "p0_0"], None, distinct_subject=True) is None
    # total falls back to the distributed scalar, not the sample sum
    assert cs.total_triples(None) == 120.0
    est = cs.estimate_pattern(A.QuadPattern(A.Var("s"), A.Var("p"),
                                            A.Var("o"), A.Var("g")))
    assert est >= 1.0
    # the capped path must still answer the query itself correctly
    uncapped = CharacteristicSets(store)
    assert uncapped._exact is True
    assert uncapped.count_star([EX + "p0_0"], None) == 1


def test_id_mode_selective_filter_pushes_to_dictionary(spark, fixture_store):
    """ID mode over a 4×long quad layout (no native scans): SELECTIVE
    value filters (equality/IN/string-match) evaluate on the dictionary
    and come back as id semi-joins BEFORE materialization — the 100 TB
    property that only filter survivors materialize. Range predicates
    deliberately do NOT push (the global dictionary makes them
    non-selective — see dictionary.py selective())."""
    from kineo_spark import algebra as A
    from kineo_spark.dictionary import id_compiler
    from kineo_spark.expr import v, c, fn
    from kineo_spark.forms import select
    from kineo_spark.model import iri, lit

    comp = id_compiler(fixture_store)
    tp = A.TriplePattern
    alg = A.Filter(
        A.BGP((tp(A.Var("s"), iri("http://xmlns.com/foaf/0.1/name"),
                  A.Var("n")),)),
        fn("STRSTARTS", v("n"), c(lit("Ber"))),
    )
    q = A.SelectQuery(alg, ("n",))
    comp.prepare(q)
    df = select(comp, q)
    assert "LeftSemi" in _plan(df)
    assert [r["n"]["lex"] for r in df.collect()] == ["Berlin"]


def test_id_mode_range_filter_not_pushed(spark, queries):
    plan = _plan(queries["sparql_id_filter_order_limit"](spark, SF))
    assert "LeftSemi" not in plan


def test_span_dedup_joins_on_gram_hash(spark, queries):
    # candidate generation must be an equi-join (hash keys), never a
    # cross product; the windowed island merge adds no extra join
    for name in ("pipe_exact_substring_spans", "pipe_decontaminate_spans"):
        plan = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
            + plan.count("BroadcastHashJoin") >= 1, name


def test_ranking_broadcasts_corpus_scalars(spark, queries):
    # N / avgdl / df tables ride as broadcasts; the only allowed
    # nested-loop is the single-row scalar crossJoin
    for name in ("pipe_tfidf_top_terms", "pipe_bm25_scores"):
        plan = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastExchange" in plan, name


def test_events_json_filter_prunes_columns(spark, queries):
    # the JSON aggregation must read only (event_type, props)
    plan = _plan(queries["pipe_events_props_agg"](spark, SF))
    assert "CartesianProduct" not in plan
    scan = plan[plan.index("FileScan"):].split("\n")[0]
    assert "event_type" in scan and "props" in scan
    assert "user_id" not in scan and "value" not in scan


def test_parquet_store_graph_partition_pruning(spark, tmp_path):
    """GRAPH-bound scans over the graph-partitioned parquet store must
    prune partitions: the FileScan's PartitionFilters carries the g_lex
    equality, so a 100 TB multi-graph store reads only the named
    graph's files."""
    from kineo_spark import algebra as A
    from kineo_spark.model import iri
    from kineo_spark.sources.stores_ext import ParquetQuadStore

    rows = [
        (0, f"urn:s{i}", "urn:p", 0, f"urn:o{i}", None, None, None,
         f"urn:g{i % 3}")
        for i in range(30)
    ]
    from kineo_spark.store import QuadsDataFrameStore
    base = QuadsDataFrameStore.from_rows(spark, rows)
    path = str(tmp_path / "pstore")
    store = ParquetQuadStore.create(spark, base.quads(), path)
    df = store.scan(A.QuadPattern(
        A.Var("s"), A.Var("p"), A.Var("o"), iri("urn:g1")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "g_lex" in plan.split(
        "PartitionFilters:")[1][:200]
    assert df.count() == 10


def test_skew_topk_single_exchange(spark, queries):
    """The skew-safe two-phase top-k shuffles ONCE: phase 1 windows on
    (spark_partition_id, key) inside each input partition (no
    Exchange), so only <= k*n_partitions survivors reach the final
    per-key window — the hot key never funnels half the table through
    one task."""
    plan = _plan(queries["pipe_skew_topk"](spark, SF))
    # exactly one hashpartitioning exchange (the final window's), with a
    # PARTIAL WindowGroupLimit upstream of it doing the map-side top-k
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]
    pre_shuffle = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in pre_shuffle and "Partial" in pre_shuffle, \
        plan[:2000]
    assert "CartesianProduct" not in plan


def test_star_pattern_pushes_kind_filter(spark, tmp_path):
    """A quoted-pattern subject over a parquet quads store must push
    s_kind = 3 (KIND_QUOTED) into the FileScan: at corpus scale the
    annotation slice is tiny and the scan filter is what bounds every
    downstream accessor expression."""
    from kineo_spark.engine import Engine
    from kineo_spark.model import QUADS_SCHEMA, iri, lit, quoted
    from kineo_spark.store import QuadsDataFrameStore

    E = "http://e/"
    qt = quoted(iri(E + "a"), iri(E + "age"), lit(30))
    rows = [
        (qt.kind, qt.lex, E + "conf", 2, "0.9", "double", None, 0.9, "g"),
        (0, E + "a", E + "age", 2, "30", "integer", None, 30.0, "g"),
    ]
    pq = str(tmp_path / "quads.parquet")
    spark.createDataFrame(rows, QUADS_SCHEMA).write.parquet(pq)
    store = QuadsDataFrameStore(spark, spark.read.parquet(pq))
    df = Engine(store).query(f"""
      PREFIX e: <{E}>
      SELECT ?who ?c WHERE {{ << ?who e:age 30 >> e:conf ?c }}
    """).bindings
    plan = _plan(df)
    # the isTRIPLE desugar filter must reach the scan as a flat
    # s_kind equality, and the constraint filters must not force a
    # cartesian anywhere
    assert "EqualTo(s_kind,3)" in plan.replace(" ", "")
    assert "CartesianProduct" not in plan


def test_graph_scoped_aggregate_single_shuffle_shape(spark, queries):
    """Per-graph subquery aggregate (r10): the GRAPH ?g scalar COUNT
    compiles to ONE partial+final aggregation keyed by the graph — not
    a per-graph driver loop — plus the broadcast empty-bag fill against
    the MEMOIZED names(D) list (one checkpointed-RDD scan, no second
    distinct over the corpus)."""
    import re

    df = queries["sparql_graph_subquery_count"](spark, SF)
    plan = _plan(df)
    # r12: group terms ride as extra group keys instead of first()
    # aggregates, so the main aggregate (and the anti-join's re-derived
    # key side) are HashAggregate pairs now — the pre-r12 plan ran them
    # as SortAggregate (first() over a term struct is not UnsafeRow-
    # mutable) and the ==2 HashAggregate count this test pinned was
    # only the empty-fill pair. Pin the intent directly: hash partial+
    # final pairs, ZERO sort aggregates, still at most two exchanges
    # (no per-graph driver loop).
    assert plan.count("SortAggregate") == 0
    n_hash = plan.count("HashAggregate")
    assert n_hash >= 2 and n_hash % 2 == 0  # partial+final pairs
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert plan.count("Scan ExistingRDD") == 1  # memoized graph_terms
    assert "CartesianProduct" not in plan
