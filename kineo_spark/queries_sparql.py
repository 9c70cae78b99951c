"""SPARQL-engine queries over the driver tables, with DuckDB oracle SQL.

Every query here runs through the full engine stack (algebra → compiler
→ Catalyst) over the RelationalQuadStore view of the parquet tables, and
has an ANSI-SQL twin DuckDB runs over the *original* tables — per the
FIXTURES.md §5 design, this makes every SPARQL operator oracle-checkable.

Column names/types are aligned on both sides (the driver hashes values
per sorted column name). SUM/AVG use exact DECIMAL accumulation on both
sides so results are independent of execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kineo_spark import algebra as A
from kineo_spark.compiler import Compiler
from kineo_spark.expr import EExists, c, fn, v
from kineo_spark.forms import ask, construct, describe, select
from kineo_spark.model import iri, lit
from kineo_spark.relational import extract
from kineo_spark.store import RDF_TYPE, RelationalQuadStore

_STORES: dict[tuple[int, str], RelationalQuadStore] = {}
_MODE = "term"  # "term" (native scans) | "id" (dictionary-encoded BGPs)


def set_mode(mode: str) -> None:
    """Execution-mode toggle (SURVEY §3.3): 'id' routes BGPs through the
    dictionary-encoded 4×long layout with lazy term materialization;
    'id128' is the same plans on two-long struct ids (the 100 TB
    collision-safe default, dictionary._id_expr)."""
    global _MODE
    assert mode in ("term", "id", "id128")
    _MODE = mode


def compiler_for(spark: SparkSession, sf_dir: str, **kw) -> Compiler:
    key = (id(spark), sf_dir)
    if key not in _STORES:
        _STORES[key] = RelationalQuadStore(spark, sf_dir)
    if _MODE in ("id", "id128"):
        from kineo_spark.dictionary import id_compiler
        return id_compiler(_STORES[key],
                           key_bits=128 if _MODE == "id128" else 64, **kw)
    return Compiler(_STORES[key], **kw)


def tp(s, p, o) -> A.TriplePattern:
    def n(x):
        return A.Var(x) if isinstance(x, str) else x
    return A.TriplePattern(n(s), n(p), n(o))


def col(t: str, c_: str):
    return iri(f"urn:col:{t}:{c_}")


def fk(t: str, c_: str):
    return iri(f"urn:fk:{t}:{c_}")


QUERIES: dict[str, callable] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None):
    def deco(f):
        QUERIES[name] = f
        if oracle is not None:
            ORACLES[name] = oracle
        return f
    return deco


# ---------------------------------------------------------------------------
# Scans / projection / filter / order / slice
# ---------------------------------------------------------------------------

@q("sparql_scan_project",
   "SELECT c_name AS name, c_mktsegment AS segment FROM customer")
def sparql_scan_project(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.BGP((
        tp("cust", col("customer", "c_name"), "name"),
        tp("cust", col("customer", "c_mktsegment"), "segment"),
    ))
    return extract(select(comp, A.SelectQuery(alg)), {
        "name": ("name", "lex"), "segment": ("segment", "lex"),
    })


@q("sparql_filter_order_limit",
   "SELECT c_name AS name, c_acctbal AS bal FROM customer "
   "WHERE c_acctbal > 8000 ORDER BY c_acctbal DESC, c_name LIMIT 10")
def sparql_filter_order_limit(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Slice(
        A.Order(
            A.Filter(
                A.BGP((
                    tp("cust", col("customer", "c_name"), "name"),
                    tp("cust", col("customer", "c_acctbal"), "bal"),
                )),
                v("bal") > c(lit(8000)),
            ),
            (A.SortComparator(v("bal"), False), A.SortComparator(v("name"), True)),
        ),
        limit=10,
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "name": ("name", "lex"), "bal": ("bal", "num"),
    })


@q("sparql_bgp_3hop_join",
   "SELECT c_name AS name, n_name AS nation, r_name AS region, c_acctbal AS bal "
   "FROM customer JOIN nation ON c_nationkey = n_nationkey "
   "JOIN region ON n_regionkey = r_regionkey WHERE c_acctbal > 7500")
def sparql_bgp_3hop_join(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.BGP((
            tp("cust", col("customer", "c_name"), "name"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("nat", col("nation", "n_name"), "nation"),
            tp("nat", fk("nation", "n_regionkey"), "reg"),
            tp("reg", col("region", "r_name"), "region"),
        )),
        v("bal") > c(lit(7500)),
    )
    # explicit projection: join-only vars (cust/nat/reg) are never
    # output — in ID mode they stay 8-byte ids end to end
    return extract(select(comp, A.SelectQuery(alg, ("name", "bal", "nation", "region"))), {
        "name": ("name", "lex"), "nation": ("nation", "lex"),
        "region": ("region", "lex"), "bal": ("bal", "num"),
    })


# ---------------------------------------------------------------------------
# OPTIONAL / UNION / MINUS / EXISTS / DISTINCT / VALUES / BIND
# ---------------------------------------------------------------------------

@q("sparql_optional_leftjoin",
   "SELECT s_name AS supplier, c_name AS customer FROM supplier "
   "LEFT JOIN customer ON customer.c_nationkey = supplier.s_nationkey "
   "AND c_acctbal > 9000")
def sparql_optional_leftjoin(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.LeftJoin(
        A.BGP((
            tp("sup", col("supplier", "s_name"), "supplier"),
            tp("sup", fk("supplier", "s_nationkey"), "nat"),
        )),
        A.BGP((
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("cust", col("customer", "c_name"), "customer"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
        expr=v("bal") > c(lit(9000)),
    )
    return extract(select(comp, A.SelectQuery(alg, ("supplier", "customer"))), {
        "supplier": ("supplier", "lex"), "customer": ("customer", "lex"),
    })


@q("sparql_union",
   "SELECT c_name AS name, 'customer' AS src FROM customer "
   "UNION ALL SELECT s_name, 'supplier' FROM supplier")
def sparql_union(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Union(
        A.Extend(
            A.Triple(tp("x", col("customer", "c_name"), "name")),
            c(lit("customer")), "src",
        ),
        A.Extend(
            A.Triple(tp("x", col("supplier", "s_name"), "name")),
            c(lit("supplier")), "src",
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "src"))), {
        "name": ("name", "lex"), "src": ("src", "lex"),
    })


@q("sparql_minus",
   "SELECT c_name AS name FROM customer WHERE NOT EXISTS "
   "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)")
def sparql_minus(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Minus(
        A.Triple(tp("cust", col("customer", "c_name"), "name")),
        A.Triple(tp("ord", fk("orders", "o_custkey"), "cust")),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name",))), {"name": ("name", "lex")})


@q("sparql_filter_not_exists",
   "SELECT s_name AS supplier FROM supplier WHERE NOT EXISTS "
   "(SELECT 1 FROM customer WHERE c_nationkey = s_nationkey AND c_acctbal > 9500)")
def sparql_filter_not_exists(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.BGP((
            tp("sup", col("supplier", "s_name"), "supplier"),
            tp("sup", fk("supplier", "s_nationkey"), "nat"),
        )),
        EExists(
            A.Filter(
                A.BGP((
                    tp("cust", fk("customer", "c_nationkey"), "nat"),
                    tp("cust", col("customer", "c_acctbal"), "bal"),
                )),
                v("bal") > c(lit(9500)),
            ),
            anti=True,
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("supplier",))), {"supplier": ("supplier", "lex")})


@q("sparql_exists_bind",
   "SELECT c_name AS cname, EXISTS(SELECT 1 FROM orders "
   "WHERE o_custkey = c_custkey) AS has_order "
   "FROM customer WHERE c_acctbal > 9000")
def sparql_exists_bind(spark, sf_dir) -> DataFrame:
    """EXISTS in expression position (BIND) — the general mark-join form
    (Compiler._mark_exists). The reference plans only the FILTER form
    (ExistsPlan, MaterializedQueryPlan.swift:1617-1660); SPARQL 1.1
    §17.4.1.4 allows EXISTS anywhere an expression appears."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.Filter(
            A.BGP((
                tp("cust", col("customer", "c_name"), "cname"),
                tp("cust", col("customer", "c_acctbal"), "bal"),
            )),
            v("bal") > c(lit(9000)),
        ),
        EExists(A.Triple(tp("ord", fk("orders", "o_custkey"), "cust"))),
        "has_order",
    )
    return extract(select(comp, A.SelectQuery(alg, ("cname", "has_order"))),
                   {"cname": ("cname", "lex"),
                    "has_order": ("has_order", "bool")})


@q("sparql_distinct",
   "SELECT DISTINCT c_mktsegment AS segment FROM customer")
def sparql_distinct(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Distinct(
        A.Project(
            A.Triple(tp("cust", col("customer", "c_mktsegment"), "segment")),
            ("segment",),
        )
    )
    return extract(select(comp, A.SelectQuery(alg)), {"segment": ("segment", "lex")})


@q("sparql_values_join",
   "SELECT n_name AS nation, r_name AS region FROM nation "
   "JOIN region ON n_regionkey = r_regionkey WHERE r_name IN ('EUROPE','ASIA')")
def sparql_values_join(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Join(
        A.BGP((
            tp("nat", col("nation", "n_name"), "nation"),
            tp("nat", fk("nation", "n_regionkey"), "reg"),
            tp("reg", col("region", "r_name"), "region"),
        )),
        A.Table(("region",), ((lit("EUROPE"),), (lit("ASIA"),))),
    )
    return extract(select(comp, A.SelectQuery(alg, ("nation", "region"))), {
        "nation": ("nation", "lex"), "region": ("region", "lex"),
    })


@q("sparql_values_bindjoin",
   "SELECT c_name AS name, c_acctbal AS bal FROM customer "
   "WHERE c_name IN ('Customer#000000001','Customer#000000002','Customer#000000003')")
def sparql_values_bindjoin(spark, sf_dir) -> DataFrame:
    """Bind join (IDIndexBindQuadPlan analog): the small VALUES table
    seeds a lex-isin pre-filter pushed into the star scan — for object
    vars backed by a stored column it lands in the parquet
    PushedFilters (In(c_name, ...)), so at 100 TB the scan reads only
    row groups the VALUES can match (tests/test_compat_join.py asserts
    the pushdown)."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Join(
        A.Table(("name",), tuple(
            (lit(f"Customer#{i:09d}"),) for i in (1, 2, 3))),
        A.BGP((
            tp("c", col("customer", "c_name"), "name"),
            tp("c", col("customer", "c_acctbal"), "bal"),
        )),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "bal"))), {
        "name": ("name", "lex"), "bal": ("bal", "num"),
    })


@q("sparql_values_bindjoin_subject",
   "SELECT 'urn:t:customer:' || c_custkey AS cust, c_name AS name, "
   "c_acctbal AS bal FROM customer WHERE c_custkey IN (1, 7, 42)")
def sparql_values_bindjoin_subject(spark, sf_dir) -> DataFrame:
    """Bind join seeded by SUBJECT row IRIs: the store inverts the
    VALUES lexes via parse_row_iri into a native `c_custkey IN (1,7,42)`
    — a pk point-lookup in parquet PushedFilters (row-group skip via
    min/max + dictionary), where an isin over the concat-built IRI
    string would scan everything (IDIndexBindQuadPlan,
    reference SPARQL/IDQueryPlan.swift; store.bind_seed_condition)."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Join(
        A.Table(("cust",), tuple(
            (iri(f"urn:t:customer:{i}"),) for i in (1, 7, 42))),
        A.BGP((
            tp("cust", col("customer", "c_name"), "name"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
    )
    return extract(select(comp, A.SelectQuery(alg, ("cust", "name", "bal"))), {
        "cust": ("cust", "lex"), "name": ("name", "lex"), "bal": ("bal", "num"),
    })


@q("sparql_bind_extend",
   "SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, "
   "l_extendedprice * (1 - l_discount) AS revenue "
   "FROM lineitem WHERE l_quantity > 45")
def sparql_bind_extend(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.Filter(
            A.BGP((
                tp("li", col("lineitem", "l_orderkey"), "orderkey"),
                tp("li", col("lineitem", "l_linenumber"), "linenumber"),
                tp("li", col("lineitem", "l_extendedprice"), "price"),
                tp("li", col("lineitem", "l_discount"), "disc"),
                tp("li", col("lineitem", "l_quantity"), "qty"),
            )),
            v("qty") > c(lit(45)),
        ),
        v("price") * (c(lit(1)) - v("disc")),
        "revenue",
    )
    return extract(select(comp, A.SelectQuery(alg, ("orderkey", "linenumber", "revenue"))), {
        "orderkey": ("orderkey", "int"), "linenumber": ("linenumber", "int"),
        "revenue": ("revenue", "num"),
    })


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_DEC = "DECIMAL(25,6)"

@q("sparql_agg_q1",
   f"SELECT l_returnflag AS returnflag, l_linestatus AS linestatus, "
   f"CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty, "
   f"CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price, "
   f"CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty, "
   f"COUNT(*) AS count_order "
   f"FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-06-01 00:00:00' "
   f"GROUP BY l_returnflag, l_linestatus")
def sparql_agg_q1(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.Filter(
            A.BGP((
                tp("li", col("lineitem", "l_returnflag"), "rf"),
                tp("li", col("lineitem", "l_linestatus"), "ls"),
                tp("li", col("lineitem", "l_quantity"), "qty"),
                tp("li", col("lineitem", "l_extendedprice"), "price"),
                tp("li", col("lineitem", "l_shipdate"), "sd"),
            )),
            v("sd") <= c(lit("1997-06-01T00:00:00", dt="dateTime")),
        ),
        groups=(v("rf"), v("ls")), group_names=("rf", "ls"),
        aggs=(
            ("sum_qty", A.AggSpec("SUM", v("qty"), exact=True)),
            ("sum_base_price", A.AggSpec("SUM", v("price"), exact=True)),
            ("avg_qty", A.AggSpec("AVG", v("qty"), exact=True)),
            ("count_order", A.AggSpec("COUNT*")),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "returnflag": ("rf", "lex"), "linestatus": ("ls", "lex"),
        "sum_qty": ("sum_qty", "num"), "sum_base_price": ("sum_base_price", "num"),
        "avg_qty": ("avg_qty", "num"), "count_order": ("count_order", "int"),
    })


@q("sparql_agg_having",
   "SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, "
   "COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey "
   "HAVING COUNT(*) >= 5")
def sparql_agg_having(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.Aggregate(
            A.Triple(tp("cust", fk("customer", "c_nationkey"), "nat")),
            groups=(v("nat"),), group_names=("nat",),
            aggs=(("n_customers", A.AggSpec("COUNT*")),),
        ),
        v("n_customers") >= c(lit(5)),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "nation": ("nat", "lex"), "n_customers": ("n_customers", "int"),
    })


@q("sparql_agg_minmax",
   f"SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, "
   f"MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal, "
   f"CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS total_bal "
   f"FROM customer GROUP BY c_nationkey")
def sparql_agg_minmax(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.BGP((
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
        groups=(v("nat"),), group_names=("nat",),
        aggs=(
            ("min_bal", A.AggSpec("MIN", v("bal"))),
            ("max_bal", A.AggSpec("MAX", v("bal"))),
            ("total_bal", A.AggSpec("SUM", v("bal"), exact=True)),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "nation": ("nat", "lex"), "min_bal": ("min_bal", "num"),
        "max_bal": ("max_bal", "num"), "total_bal": ("total_bal", "num"),
    })


@q("sparql_agg_minmax_optional",
   "SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, "
   "MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price "
   "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
   "GROUP BY c_nationkey")
def sparql_agg_minmax_optional(spark, sf_dir) -> DataFrame:
    """MIN/MAX over an OPTIONAL operand: groups mixing bound and
    UNBOUND rows take the extremum of the bound values — error rows are
    SKIPPED, not compared (reference MinimumAggregate `try?`-skip,
    MaterializedQueryPlan.swift:2197-2242; SQL MIN/MAX skip NULLs, so
    DuckDB is a faithful oracle). Regression for the r12 fuzz find:
    sort_key over a null term struct is a non-null struct of nulls that
    sorted smallest, so any nation with an order-less customer got an
    unbound MIN."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.LeftJoin(
            A.BGP((tp("cust", fk("customer", "c_nationkey"), "nat"),)),
            A.BGP((
                tp("ord", fk("orders", "o_custkey"), "cust"),
                tp("ord", col("orders", "o_totalprice"), "price"),
            )),
        ),
        groups=(v("nat"),), group_names=("nat",),
        aggs=(
            ("min_price", A.AggSpec("MIN", v("price"))),
            ("max_price", A.AggSpec("MAX", v("price"))),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "nation": ("nat", "lex"), "min_price": ("min_price", "num"),
        "max_price": ("max_price", "num"),
    })


@q("sparql_group_concat",
   "SELECT r_name AS region, string_agg(n_name, ',' ORDER BY n_name) AS nations "
   "FROM region JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name")
def sparql_group_concat(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.BGP((
            tp("nat", col("nation", "n_name"), "nname"),
            tp("nat", fk("nation", "n_regionkey"), "reg"),
            tp("reg", col("region", "r_name"), "region"),
        )),
        groups=(v("region"),), group_names=("region",),
        aggs=(("nations", A.AggSpec("GROUP_CONCAT", v("nname"), separator=",")),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "region": ("region", "lex"), "nations": ("nations", "lex"),
    })


@q("sparql_count_distinct",
   "SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, "
   "COUNT(DISTINCT c_mktsegment) AS n_segments FROM customer GROUP BY c_nationkey")
def sparql_count_distinct(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.BGP((
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("cust", col("customer", "c_mktsegment"), "seg"),
        )),
        groups=(v("nat"),), group_names=("nat",),
        aggs=(("n_segments", A.AggSpec("COUNT", v("seg"), distinct=True)),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "nation": ("nat", "lex"), "n_segments": ("n_segments", "int"),
    })


@q("sparql_subquery_join_agg",
   f"SELECT n_name AS nation, avg_bal FROM nation JOIN ("
   f"SELECT c_nationkey, CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal "
   f"FROM customer GROUP BY c_nationkey) a ON a.c_nationkey = n_nationkey "
   f"WHERE avg_bal > 4000")
def sparql_subquery_join_agg(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    sub = A.Subquery(
        A.SelectQuery(
            A.Aggregate(
                A.BGP((
                    tp("cust", fk("customer", "c_nationkey"), "nat"),
                    tp("cust", col("customer", "c_acctbal"), "bal"),
                )),
                groups=(v("nat"),), group_names=("nat",),
                aggs=(("avg_bal", A.AggSpec("AVG", v("bal"), exact=True)),),
            ),
            ("nat", "avg_bal"),
        )
    )
    alg = A.Filter(
        A.Join(A.Triple(tp("nat", col("nation", "n_name"), "nation")), sub),
        v("avg_bal") > c(lit(4000)),
    )
    return extract(select(comp, A.SelectQuery(alg, ("nation", "avg_bal"))), {
        "nation": ("nation", "lex"), "avg_bal": ("avg_bal", "num"),
    })


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@q("sparql_window_rank",
   "SELECT name, nation, bal, rnk FROM (SELECT c_name AS name, "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, c_acctbal AS bal, "
   "CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS rnk "
   "FROM customer) WHERE rnk <= 3")
def sparql_window_rank(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.Window(
            A.BGP((
                tp("cust", col("customer", "c_name"), "name"),
                tp("cust", fk("customer", "c_nationkey"), "nat"),
                tp("cust", col("customer", "c_acctbal"), "bal"),
            )),
            functions=(
                ("rnk", A.WindowSpec("RANK", partition=(v("nat"),),
                                     order=(A.SortComparator(v("bal"), False),))),
            ),
        ),
        v("rnk") <= c(lit(3)),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "nat", "bal", "rnk"))), {
        "name": ("name", "lex"), "nation": ("nat", "lex"),
        "bal": ("bal", "num"), "rnk": ("rnk", "int"),
    })


@q("sparql_window_rownumber",
   "SELECT name, rn FROM (SELECT c_name AS name, "
   "CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_name) AS BIGINT) AS rn "
   "FROM customer) WHERE rn <= 2")
def sparql_window_rownumber(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.Window(
            A.BGP((
                tp("cust", col("customer", "c_name"), "name"),
                tp("cust", col("customer", "c_mktsegment"), "seg"),
                tp("cust", col("customer", "c_acctbal"), "bal"),
            )),
            functions=(
                ("rn", A.WindowSpec("ROW_NUMBER", partition=(v("seg"),),
                                    order=(A.SortComparator(v("bal"), False),
                                           A.SortComparator(v("name"), True)))),
            ),
        ),
        v("rn") <= c(lit(2)),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "rn"))), {
        "name": ("name", "lex"), "rn": ("rn", "int"),
    })


@q("sparql_window_running_sum",
   f"SELECT o_orderkey AS orderkey, "
   f"CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER ("
   f"PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
   f"ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total "
   f"FROM orders")
def sparql_window_running_sum(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Window(
        A.BGP((
            tp("ord", col("orders", "o_orderkey"), "okey"),
            tp("ord", fk("orders", "o_custkey"), "cust"),
            tp("ord", col("orders", "o_orderdate"), "odate"),
            tp("ord", col("orders", "o_totalprice"), "price"),
        )),
        functions=(
            ("running_total", A.WindowSpec(
                "SUM", expr=v("price"), partition=(v("cust"),),
                order=(A.SortComparator(v("odate"), True), A.SortComparator(v("okey"), True)),
                frame_start=None, frame_end=0, exact=True,
            )),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("okey", "running_total"))), {
        "orderkey": ("okey", "int"), "running_total": ("running_total", "num"),
    })


@q("sparql_window_range_sum",
   f"SELECT o_orderkey AS orderkey, "
   f"CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER ("
   f"PARTITION BY o_custkey ORDER BY o_totalprice "
   f"RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS DOUBLE) AS near_total "
   f"FROM orders")
def sparql_window_range_sum(spark, sf_dir) -> DataFrame:
    """RANGE-framed windowed aggregate — sum of each customer's orders
    priced within ±1000 of the current order. An extension past the
    reference (RANGE frames throw at MaterializedQueryPlan.swift:
    849-852); Spark's rangeBetween peer-groups on the ORDER BY value,
    so duplicate prices need no tiebreak for determinism."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Window(
        A.BGP((
            tp("ord", col("orders", "o_orderkey"), "okey"),
            tp("ord", fk("orders", "o_custkey"), "cust"),
            tp("ord", col("orders", "o_totalprice"), "price"),
        )),
        functions=(
            ("near_total", A.WindowSpec(
                "SUM", expr=v("price"), partition=(v("cust"),),
                order=(A.SortComparator(v("price"), True),),
                frame_type="RANGE", frame_start=-1000, frame_end=1000,
                exact=True,
            )),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("okey", "near_total"))), {
        "orderkey": ("okey", "int"), "near_total": ("near_total", "num"),
    })


# ---------------------------------------------------------------------------
# Property paths
# ---------------------------------------------------------------------------

@q("sparql_path_seq",
   "SELECT 'urn:t:orders:' || CAST(o_orderkey AS VARCHAR) AS ord, "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation "
   "FROM orders JOIN customer ON o_custkey = c_custkey")
def sparql_path_seq(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        A.Var("ord"),
        A.PSeq(A.PLink(fk("orders", "o_custkey")), A.PLink(fk("customer", "c_nationkey"))),
        A.Var("nation"),
    )
    return extract(select(comp, A.SelectQuery(alg, ("ord", "nation"))), {
        "ord": ("ord", "lex"), "nation": ("nation", "lex"),
    })


@q("sparql_path_inverse",
   "SELECT 'urn:t:region:' || CAST(n_regionkey AS VARCHAR) AS region, "
   "'urn:t:nation:' || CAST(n_nationkey AS VARCHAR) AS nation FROM nation")
def sparql_path_inverse(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        A.Var("region"), A.PInv(A.PLink(fk("nation", "n_regionkey"))), A.Var("nation")
    )
    return extract(select(comp, A.SelectQuery(alg, ("region", "nation"))), {
        "region": ("region", "lex"), "nation": ("nation", "lex"),
    })


@q("sparql_path_alt_plus",
   "SELECT 'urn:t:orders:' || CAST(o_orderkey AS VARCHAR) AS src, "
   "'urn:t:customer:' || CAST(o_custkey AS VARCHAR) AS dst FROM orders "
   "UNION ALL SELECT 'urn:t:customer:' || CAST(c_custkey AS VARCHAR), "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) FROM customer "
   "UNION ALL SELECT 'urn:t:nation:' || CAST(n_nationkey AS VARCHAR), "
   "'urn:t:region:' || CAST(n_regionkey AS VARCHAR) FROM nation "
   "UNION ALL SELECT 'urn:t:orders:' || CAST(o_orderkey AS VARCHAR), "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) "
   "FROM orders JOIN customer ON o_custkey = c_custkey "
   "UNION ALL SELECT 'urn:t:customer:' || CAST(c_custkey AS VARCHAR), "
   "'urn:t:region:' || CAST(n_regionkey AS VARCHAR) "
   "FROM customer JOIN nation ON c_nationkey = n_nationkey "
   "UNION ALL SELECT 'urn:t:orders:' || CAST(o_orderkey AS VARCHAR), "
   "'urn:t:region:' || CAST(n_regionkey AS VARCHAR) "
   "FROM orders JOIN customer ON o_custkey = c_custkey "
   "JOIN nation ON c_nationkey = n_nationkey")
def sparql_path_alt_plus(spark, sf_dir) -> DataFrame:
    """(fk_orders_cust | fk_customer_nation | fk_nation_region)+ — full
    transitive closure over the FK graph via the distributed fixpoint.

    r12: steady-state shuffle re-baselined 8.73 -> ~11 MB. The node map
    is now hash-deduped, checkpoint-counted in its own (overlapped) job
    and BROADCAST into the materialize joins (paths.py r12); an A/B at
    d265636~1 measured 10.73 MB in the identical harness, so the code
    delta is ~+0.3 MB, traded for wall 3.6 -> 2.3 s (SortAggregate
    pairs and the closure-side materialize shuffle removed)."""
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        A.Var("src"),
        A.PPlus(A.PAlt(
            A.PAlt(A.PLink(fk("orders", "o_custkey")), A.PLink(fk("customer", "c_nationkey"))),
            A.PLink(fk("nation", "n_regionkey")),
        )),
        A.Var("dst"),
    )
    return extract(select(comp, A.SelectQuery(alg, ("src", "dst"))), {
        "src": ("src", "lex"), "dst": ("dst", "lex"),
    })


@q("sparql_graph_path_scoped",
   # per-graph closure: the two FK edge kinds live in DIFFERENT named
   # graphs (urn:g:orders / urn:g:customer), so (fk_oc|fk_cn)+ under
   # GRAPH ?g must yield only single hops per graph - NO orders->
   # customer->nation composition across graphs. The r7 evaluator ran
   # the closure over the union of graphs and cross-joined the graph
   # list; this oracle pins the per-graph semantics the r8 fix gives.
   "SELECT 'urn:g:orders' AS g, "
   "'urn:t:orders:' || CAST(o_orderkey AS VARCHAR) AS src, "
   "'urn:t:customer:' || CAST(o_custkey AS VARCHAR) AS dst FROM orders "
   "WHERE o_orderkey % 20 = 0 "
   "UNION ALL SELECT 'urn:g:customer', "
   "'urn:t:customer:' || CAST(c_custkey AS VARCHAR), "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) FROM customer")
def sparql_graph_path_scoped(spark, sf_dir) -> DataFrame:
    """GRAPH ?g { ?src (fk_orders_cust|fk_customer_nation)+ ?dst } -
    the alternation's edges come from different named graphs, so the
    per-graph closure reduces to single hops with ?g bound per table
    graph (SPARQL 1.1 \u00a718.1.7). The orders side is thinned with a
    key filter so the result set stays driver-comparable."""
    comp = compiler_for(spark, sf_dir)
    alg = A.NamedGraph(A.Var("g"), A.PathPattern(
        A.Var("src"),
        A.PPlus(A.PAlt(A.PLink(fk("orders", "o_custkey")),
                       A.PLink(fk("customer", "c_nationkey")))),
        A.Var("dst"),
    ))
    out = extract(select(comp, A.SelectQuery(alg, ("g", "src", "dst"))), {
        "g": ("g", "lex"), "src": ("src", "lex"), "dst": ("dst", "lex"),
    })
    from pyspark.sql import functions as F2
    return out.filter(
        (F2.col("g") != "urn:g:orders")
        | (F2.split(F2.col("src"), ":").getItem(3).cast("long") % 20 == 0))


@q("sparql_path_zero_or_one",
   "SELECT 'urn:t:nation:0' AS dst "
   "UNION ALL SELECT 'urn:t:region:' || CAST(n_regionkey AS VARCHAR) "
   "FROM nation WHERE n_nationkey = 0")
def sparql_path_zero_or_one(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        iri("urn:t:nation:0"),
        A.PZeroOrOne(A.PLink(fk("nation", "n_regionkey"))),
        A.Var("dst"),
        graph=iri("urn:g:nation"),
    )
    return extract(select(comp, A.SelectQuery(alg, ("dst",))), {"dst": ("dst", "lex")})


@q("sparql_path_nps",
   "SELECT 'urn:t:nation:' || CAST(n_nationkey AS VARCHAR) AS s, "
   "'urn:class:nation' AS o FROM nation "
   "UNION ALL SELECT 'urn:t:nation:' || CAST(n_nationkey AS VARCHAR), n_name FROM nation "
   "UNION ALL SELECT 'urn:t:nation:' || CAST(n_nationkey AS VARCHAR), "
   "CAST(n_nationkey AS VARCHAR) FROM nation "
   "UNION ALL SELECT 'urn:t:nation:' || CAST(n_nationkey AS VARCHAR), "
   "CAST(n_regionkey AS VARCHAR) FROM nation")
def sparql_path_nps(spark, sf_dir) -> DataFrame:
    """!(urn:fk:nation:n_regionkey) within the nation graph: every edge
    except the FK — type quads + the three literal columns."""
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        A.Var("s"), A.PNps((fk("nation", "n_regionkey"),)), A.Var("o"),
        graph=iri("urn:g:nation"),
    )
    return extract(select(comp, A.SelectQuery(alg, ("s", "o"))), {
        "s": ("s", "lex"), "o": ("o", "lex"),
    })


# ---------------------------------------------------------------------------
# Query forms & dataset
# ---------------------------------------------------------------------------

@q("sparql_ask",
   "SELECT EXISTS(SELECT 1 FROM customer WHERE c_acctbal > 9000) AS ask")
def sparql_ask(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    result = ask(comp, A.AskQuery(
        A.Filter(
            A.Triple(tp("cust", col("customer", "c_acctbal"), "bal")),
            v("bal") > c(lit(9000)),
        )
    ))
    return spark.createDataFrame([(result,)], "ask boolean")


@q("sparql_construct",
   "SELECT DISTINCT 'urn:t:customer:' || CAST(c_custkey AS VARCHAR) AS s, "
   "'urn:p:inNation' AS p, n_name AS o "
   "FROM customer JOIN nation ON c_nationkey = n_nationkey")
def sparql_construct(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    cq = A.ConstructQuery(
        A.BGP((
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("nat", col("nation", "n_name"), "nname"),
        )),
        template=(A.TriplePattern(A.Var("cust"), iri("urn:p:inNation"), A.Var("nname")),),
    )
    df = construct(comp, cq)
    return df.select(
        df["s"]["lex"].alias("s"), df["p"]["lex"].alias("p"), df["o"]["lex"].alias("o")
    )


@q("sparql_describe",
   f"SELECT 'urn:t:region:0' AS s, '{RDF_TYPE}' AS p, 'urn:class:region' AS o "
   "UNION ALL SELECT 'urn:t:region:0', 'urn:col:region:r_regionkey', "
   "CAST(r_regionkey AS VARCHAR) FROM region WHERE r_regionkey = 0 "
   "UNION ALL SELECT 'urn:t:region:0', 'urn:col:region:r_name', r_name "
   "FROM region WHERE r_regionkey = 0")
def sparql_describe(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    df = describe(comp, A.DescribeQuery(A.JoinIdentity(), nodes=(iri("urn:t:region:0"),)))
    return df.select(
        df["s"]["lex"].alias("s"), df["p"]["lex"].alias("p"), df["o"]["lex"].alias("o")
    )


@q("sparql_count_star_stats",
   "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer")
def sparql_count_star_stats(spark, sf_dir) -> DataFrame:
    """Stats-driven COUNT-star shortcut: an ungrouped COUNT(*) over a
    simple star answers from characteristic-set statistics as a
    constant table — the final plan contains NO quads scan (asserted in
    test_plan_quality.py). Reference: Diomede's
    characteristicSetSatisfiableCountPlan, DiomedeQuadStore.swift:
    14-97."""
    comp = compiler_for(spark, sf_dir, cs_stats=True)
    alg = A.Aggregate(
        A.BGP((
            tp("cust", col("customer", "c_name"), "name"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
        groups=(), group_names=(),
        aggs=(("n", A.AggSpec("COUNT*")),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {"n": ("n", "int")})


@q("sparql_graph_stats",
   "SELECT 'urn:g:customer' AS g, CAST(COUNT(*) * 7 AS BIGINT) AS n FROM customer "
   "UNION ALL SELECT 'urn:g:nation', COUNT(*) * 5 FROM nation "
   "UNION ALL SELECT 'urn:g:region', COUNT(*) * 3 FROM region "
   "UNION ALL SELECT 'urn:g:supplier', COUNT(*) * 6 FROM supplier "
   "UNION ALL SELECT 'urn:g:part', COUNT(*) * 7 FROM part "
   "UNION ALL SELECT 'urn:g:orders', COUNT(*) * 8 FROM orders "
   "UNION ALL SELECT 'urn:g:lineitem', COUNT(*) * 15 FROM lineitem "
   "UNION ALL SELECT 'urn:g:events', COUNT(*) * 7 FROM events "
   "UNION ALL SELECT 'urn:g:documents', COUNT(*) * 6 FROM documents "
   "UNION ALL SELECT 'urn:g:embeddings', COUNT(*) * 3 FROM embeddings")
def sparql_graph_stats(spark, sf_dir) -> DataFrame:
    """GraphDescription-style per-graph quad counts (reference
    QuadStore.swift:28-42,303-356) — a full scan of the virtual
    quadstore grouped by graph."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.NamedGraph(A.Var("g"), A.Triple(tp("s", A.Var("p"), A.Var("o")))),
        groups=(v("g"),), group_names=("g",),
        aggs=(("n", A.AggSpec("COUNT*")),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "g": ("g", "lex"), "n": ("n", "int"),
    })


@q("sparql_distinct_order_limit",
   "SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY seg LIMIT 3")
def sparql_distinct_order_limit(spark, sf_dir) -> DataFrame:
    """SELECT DISTINCT ?seg ... ORDER BY ?seg LIMIT 3 — the r10 fix:
    dedup runs FIRST, then the sort (dropDuplicates does not preserve
    row order, so the previous sort-then-dedup handed the LIMIT an
    arbitrary order). The plan folds into dedup +
    TakeOrderedAndProject."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Slice(
        A.Distinct(A.Project(
            A.Order(A.Triple(tp("c", col("customer", "c_mktsegment"),
                              "seg")),
                    (A.SortComparator(v("seg"), True),)),
            ("seg",))),
        offset=0, limit=3)
    return extract(select(comp, A.SelectQuery(alg, ("seg",))), {
        "seg": ("seg", "lex"),
    })


@q("sparql_graph_subquery_count",
   "SELECT 'urn:g:customer' AS g, CAST(COUNT(*) AS BIGINT) AS c FROM customer "
   "UNION ALL SELECT 'urn:g:' || t, 0 FROM (VALUES ('region'),('nation'),"
   "('supplier'),('part'),('orders'),('lineitem'),('events'),('documents'),"
   "('embeddings')) AS x(t)")
def sparql_graph_subquery_count(spark, sf_dir) -> DataFrame:
    """GRAPH ?g { { SELECT (COUNT(*) AS ?c) WHERE { ?s
    <urn:col:customer:c_acctbal> ?bal } } }: §18.1.7 per-graph
    evaluation of a SCALAR subquery aggregate — one row per named
    graph, including the empty-bag COUNT()=0 rows for the nine graphs
    the pattern never matches (the r10 fix; previously this returned
    one cross-graph total bound to an arbitrary graph). Reference:
    per-graph union wraps all operators, QueryPlanner.swift:834-878."""
    comp = compiler_for(spark, sf_dir)
    agg = A.Aggregate(
        A.Triple(tp("s", col("customer", "c_acctbal"), "bal")),
        groups=(), group_names=(),
        aggs=(("c", A.AggSpec("COUNT*")),))
    alg = A.NamedGraph(
        A.Var("g"), A.Subquery(A.SelectQuery(agg, ("c",))))
    return extract(select(comp, A.SelectQuery(alg, ("g", "c"))), {
        "g": ("g", "lex"), "c": ("c", "int"),
    })


@q("sparql_graph_subquery_limit",
   "SELECT 'urn:g:region' AS g, (SELECT min('urn:t:region:' || CAST(r_regionkey AS VARCHAR)) FROM region) AS s "
   "UNION ALL SELECT 'urn:g:nation', (SELECT min('urn:t:nation:' || CAST(n_nationkey AS VARCHAR)) FROM nation) "
   "UNION ALL SELECT 'urn:g:customer', (SELECT min('urn:t:customer:' || CAST(c_custkey AS VARCHAR)) FROM customer) "
   "UNION ALL SELECT 'urn:g:supplier', (SELECT min('urn:t:supplier:' || CAST(s_suppkey AS VARCHAR)) FROM supplier) "
   "UNION ALL SELECT 'urn:g:part', (SELECT min('urn:t:part:' || CAST(p_partkey AS VARCHAR)) FROM part) "
   "UNION ALL SELECT 'urn:g:orders', (SELECT min('urn:t:orders:' || CAST(o_orderkey AS VARCHAR)) FROM orders) "
   "UNION ALL SELECT 'urn:g:lineitem', 'urn:t:lineitem:0' "
   "UNION ALL SELECT 'urn:g:events', (SELECT min('urn:t:events:' || CAST(event_id AS VARCHAR)) FROM events) "
   "UNION ALL SELECT 'urn:g:documents', (SELECT min('urn:t:documents:' || CAST(doc_id AS VARCHAR)) FROM documents) "
   "UNION ALL SELECT 'urn:g:embeddings', (SELECT min('urn:t:embeddings:' || CAST(vec_id AS VARCHAR)) FROM embeddings)")
def sparql_graph_subquery_limit(spark, sf_dir) -> DataFrame:
    """GRAPH ?g { { SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s LIMIT 1 } }:
    OFFSET/LIMIT under GRAPH ?var apply PER GRAPH (§18.1.7) — the
    lexically-smallest subject of EVERY named graph, not a single
    global row. Compiles to one per-graph row_number window, no
    driver loop (the 100 TB form). The lineitem oracle branch is the
    constant 'urn:t:lineitem:0': its row IRIs use the parquet row
    index, whose string-min is always \"0\"."""
    comp = compiler_for(spark, sf_dir)
    inner = A.Slice(
        A.Project(
            A.Order(A.Triple(tp("s", A.Var("p"), A.Var("o"))),
                    (A.SortComparator(v("s"), True),)),
            ("s",)),
        offset=0, limit=1)
    alg = A.NamedGraph(
        A.Var("g"), A.Subquery(A.SelectQuery(inner, ("s",))))
    return extract(select(comp, A.SelectQuery(alg, ("g", "s"))), {
        "g": ("g", "lex"), "s": ("s", "lex"),
    })


@q("sparql_graph_minus_disjoint",
   "SELECT 'urn:g:nation' AS g, "
   "'urn:t:nation:' || CAST(n_nationkey AS VARCHAR) AS s, n_name AS n "
   "FROM nation")
def sparql_graph_minus_disjoint(spark, sf_dir) -> DataFrame:
    """GRAPH ?g { ?s <n_name> ?n MINUS { VALUES ?z { 1 } } } — §18.1.7:
    the MINUS evaluates per graph with plain §18.5 semantics, where the
    active-graph var is evaluation SCOPE, not a mapping variable. The
    sides share no variables, so dom-disjointness means NOTHING is
    cancelled (r11 fuzz find: the threaded graph column previously
    made both sides 'share' ?g, and the graph-transparent VALUES row —
    bound once per named graph — cancelled every row of its graph).
    Reference: MinusPlan dom-disjointness,
    MaterializedQueryPlan.swift:554-569."""
    comp = compiler_for(spark, sf_dir)
    alg = A.NamedGraph(
        A.Var("g"),
        A.Minus(A.Triple(tp("s", col("nation", "n_name"), "n")),
                A.Table(("z",), ((lit(1),),))))
    return extract(select(comp, A.SelectQuery(alg, ("g", "s", "n"))), {
        "g": ("g", "lex"), "s": ("s", "lex"), "n": ("n", "lex"),
    })


# ---------------------------------------------------------------------------
# Expression surface
# ---------------------------------------------------------------------------

@q("sparql_expr_strings",
   "SELECT c_name AS name, upper(c_name) AS uname, "
   "CAST(length(c_name) AS BIGINT) AS name_len, "
   "substr(c_name, 1, 8) AS prefix, md5(c_name) AS name_md5, "
   "replace(c_name, 'Customer', 'C') AS short_name "
   "FROM customer WHERE contains(c_name, '00001')")
def sparql_expr_strings(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    base = A.Filter(
        A.Triple(tp("cust", col("customer", "c_name"), "name")),
        fn("CONTAINS", v("name"), c(lit("00001"))),
    )
    alg = base
    for name_, e in [
        ("uname", fn("UCASE", v("name"))),
        ("name_len", fn("STRLEN", v("name"))),
        ("prefix", fn("SUBSTR", v("name"), c(lit(1)), c(lit(8)))),
        ("name_md5", fn("MD5", v("name"))),
        ("short_name", fn("REPLACE", v("name"), c(lit("Customer")), c(lit("C")))),
    ]:
        alg = A.Extend(alg, e, name_)
    return extract(
        select(comp, A.SelectQuery(alg, ("name", "uname", "name_len", "prefix", "name_md5", "short_name"))),
        {
            "name": ("name", "lex"), "uname": ("uname", "lex"),
            "name_len": ("name_len", "int"), "prefix": ("prefix", "lex"),
            "name_md5": ("name_md5", "lex"), "short_name": ("short_name", "lex"),
        },
    )


@q("sparql_expr_datetime",
   "SELECT o_orderkey AS orderkey, "
   "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y, "
   "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m, "
   "CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d "
   "FROM orders WHERE EXTRACT(month FROM o_orderdate) = 1")
def sparql_expr_datetime(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.Extend(
            A.Extend(
                A.Extend(
                    A.BGP((
                        tp("ord", col("orders", "o_orderkey"), "okey"),
                        tp("ord", col("orders", "o_orderdate"), "odate"),
                    )),
                    fn("YEAR", v("odate")), "y",
                ),
                fn("MONTH", v("odate")), "m",
            ),
            fn("DAY", v("odate")), "d",
        ),
        fn("MONTH", v("odate")) == c(lit(1)),
    )
    return extract(select(comp, A.SelectQuery(alg, ("okey", "y", "m", "d"))), {
        "orderkey": ("okey", "int"), "y": ("y", "int"), "m": ("m", "int"), "d": ("d", "int"),
    })


@q("sparql_expr_timezone",
   "SELECT event_id AS eid, 'PT0S' AS tzd, 'Z' AS tz FROM events "
   "WHERE event_id <= 200")
def sparql_expr_timezone(spark, sf_dir) -> DataFrame:
    """TIMEZONE()/TZ() over dateTime terms (reference
    Expression.swift:140-176): engine timestamps materialize as UTC
    dateTime lexicals, so TIMEZONE is the PT0S dayTimeDuration and TZ is
    "Z"; the W3C manifest13 entries cover non-UTC offsets and the
    absent-timezone error path."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.Extend(
            A.Filter(
                A.BGP((
                    tp("ev", col("events", "event_id"), "eid"),
                    tp("ev", col("events", "ts"), "when"),
                )),
                v("eid") <= c(lit(200)),
            ),
            fn("TIMEZONE", v("when")), "tzd",
        ),
        fn("TZ", v("when")), "tz",
    )
    return extract(select(comp, A.SelectQuery(alg, ("eid", "tzd", "tz"))), {
        "eid": ("eid", "int"), "tzd": ("tzd", "lex"), "tz": ("tz", "lex"),
    })


@q("sparql_expr_conditional",
   "SELECT c_name AS name, CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier "
   "FROM customer")
def sparql_expr_conditional(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.BGP((
            tp("cust", col("customer", "c_name"), "name"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
        fn("IF", v("bal") > c(lit(5000)), c(lit("high")), c(lit("low"))),
        "tier",
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "tier"))), {
        "name": ("name", "lex"), "tier": ("tier", "lex"),
    })


@q("sparql_reduced",
   "SELECT DISTINCT c_mktsegment AS segment, "
   "'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation FROM customer")
def sparql_reduced(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Reduced(
        A.Project(
            A.BGP((
                tp("cust", col("customer", "c_mktsegment"), "segment"),
                tp("cust", fk("customer", "c_nationkey"), "nat"),
            )),
            ("segment", "nat"),
        )
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "segment": ("segment", "lex"), "nation": ("nat", "lex"),
    })


# ---------------------------------------------------------------------------
# RDF-star / SPARQL-star (KIND_QUOTED extension; the reference declares the
# rdf-tests-12 suite in .gitmodules but ships no RDF-star surface)
# ---------------------------------------------------------------------------

def _star_store(spark, sf_dir):
    """Quads for nation/region name + FK edges, plus an RDF-star
    annotation per nation: << nationRow n_name "name" >> prov:source
    "census-{k%3}". The quoted subject's packed lex is built in pure
    Column space via quoted_col, so the store construction itself
    exercises the TRIPLE() encoding distributed, not driver-side."""
    from pyspark.sql import functions as F

    from kineo_spark.model import quoted_col, term_struct
    from kineo_spark.store import QuadsDataFrameStore, read_table

    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")
    b = lambda k: F.lit(k).cast("tinyint")  # noqa: E731

    def quad(s_kind, s_lex, p, o_kind, o_lex, o_dt):
        return F.struct(
            s_kind.alias("s_kind"), s_lex.alias("s_lex"),
            F.lit(p).alias("p_lex"), o_kind.alias("o_kind"),
            o_lex.alias("o_lex"),
            (F.lit(o_dt).cast("string")).alias("o_dt"),
            ns.alias("o_lang"), nd.alias("o_num"),
            F.lit("urn:g:star").alias("g_lex"))

    n_row = F.concat(F.lit("urn:t:nation:"), F.col("n_nationkey").cast("string"))
    r_row = F.concat(F.lit("urn:t:region:"), F.col("r_regionkey").cast("string"))
    r_fk = F.concat(F.lit("urn:t:region:"), F.col("n_regionkey").cast("string"))

    name_q = nation.select(quad(b(0), n_row, "urn:col:nation:n_name",
                                b(2), F.col("n_name"), "string").alias("q"))
    fk_q = nation.select(quad(b(0), n_row, "urn:fk:nation:n_regionkey",
                              b(0), r_fk, None).alias("q"))
    rname_q = region.select(quad(b(0), r_row, "urn:col:region:r_name",
                                 b(2), F.col("r_name"), "string").alias("q"))
    qt = quoted_col(
        term_struct(b(0), n_row, ns, ns, nd),
        term_struct(b(0), F.lit("urn:col:nation:n_name"), ns, ns, nd),
        term_struct(b(2), F.col("n_name"), F.lit("string"), ns, nd))
    src = F.concat(F.lit("census-"), (F.col("n_nationkey") % 3).cast("string"))
    ann_q = nation.select(quad(qt["kind"], qt["lex"], "urn:prov:source",
                               b(2), src, "string").alias("q"))
    quads = name_q.unionByName(fk_q).unionByName(rname_q).unionByName(ann_q)
    return QuadsDataFrameStore(spark, quads.select("q.*"))


def _star_customer_store(spark, sf_dir):
    """RDF-star store over the tables that SCALE with the stress
    corpus (customer/orders replicate; nation/region stay shared):
    one annotation per customer << custRow c_name "name" >>
    prov:source "census-{k%3}" plus the orders FK edge. Used by the
    scale-stress star query so the s_kind=3 scan filter's shuffle
    linearity is measured, not argued (VERDICT r6 item 6)."""
    from pyspark.sql import functions as F

    from kineo_spark.model import quoted_col, term_struct
    from kineo_spark.store import QuadsDataFrameStore, read_table

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")
    b = lambda k: F.lit(k).cast("tinyint")  # noqa: E731

    def quad(s_kind, s_lex, p, o_kind, o_lex, o_dt):
        return F.struct(
            s_kind.alias("s_kind"), s_lex.alias("s_lex"),
            F.lit(p).alias("p_lex"), o_kind.alias("o_kind"),
            o_lex.alias("o_lex"),
            (F.lit(o_dt).cast("string")).alias("o_dt"),
            ns.alias("o_lang"), nd.alias("o_num"),
            F.lit("urn:g:star").alias("g_lex"))

    c_row = F.concat(F.lit("urn:t:customer:"),
                     F.col("c_custkey").cast("string"))
    o_row = F.concat(F.lit("urn:t:orders:"),
                     F.col("o_orderkey").cast("string"))
    c_fk = F.concat(F.lit("urn:t:customer:"),
                    F.col("o_custkey").cast("string"))

    name_q = customer.select(quad(b(0), c_row, "urn:col:customer:c_name",
                                  b(2), F.col("c_name"), "string").alias("q"))
    qt = quoted_col(
        term_struct(b(0), c_row, ns, ns, nd),
        term_struct(b(0), F.lit("urn:col:customer:c_name"), ns, ns, nd),
        term_struct(b(2), F.col("c_name"), F.lit("string"), ns, nd))
    src = F.concat(F.lit("census-"), (F.col("c_custkey") % 3).cast("string"))
    ann_q = customer.select(quad(qt["kind"], qt["lex"], "urn:prov:source",
                                 b(2), src, "string").alias("q"))
    ofk_q = orders.select(quad(b(0), o_row, "urn:fk:orders:o_custkey",
                               b(0), c_fk, None).alias("q"))
    quads = name_q.unionByName(ann_q).unionByName(ofk_q)
    return QuadsDataFrameStore(spark, quads.select("q.*"))


@q("sparql_star_fk_annotation",
   "SELECT c_name AS name, 'urn:t:orders:' || CAST(o_orderkey AS VARCHAR) "
   "AS orow FROM customer JOIN orders ON o_custkey = c_custkey "
   "WHERE c_custkey % 3 = 1")
def sparql_star_fk_annotation(spark, sf_dir) -> DataFrame:
    """Quoted-pattern decomposition at CORPUS scale: the annotation
    pattern's s_kind=3 scan filter bounds accessor work to the
    annotation slice, then ?c joins the orders FK edge — the join
    shuffle grows with orders, the star slice with customers. This is
    the stress harness's star row (tools/stress_scale.py)."""
    from kineo_spark.engine import Engine

    r = Engine(_star_customer_store(spark, sf_dir)).query("""
      SELECT ?name ?orow WHERE {
        << ?c <urn:col:customer:c_name> ?name >> <urn:prov:source> "census-1" .
        ?o <urn:fk:orders:o_custkey> ?c .
        BIND(STR(?o) AS ?orow)
      }
    """)
    return extract(r.bindings, {"name": ("name", "lex"),
                                "orow": ("orow", "lex")})


@q("sparql_star_annotation",
   "SELECT n_name AS name, 'census-' || CAST(n_nationkey % 3 AS VARCHAR) AS src "
   "FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'")
def sparql_star_annotation(spark, sf_dir) -> DataFrame:
    """Quoted-pattern decomposition joined with a plain BGP: the star
    subject's variable components bind via positional key extraction
    (parser desugar → ISTRIPLE/SAMETERM key-compare fast paths), then
    ?row joins the FK chain to region."""
    from kineo_spark.engine import Engine

    r = Engine(_star_store(spark, sf_dir)).query("""
      SELECT ?name ?src WHERE {
        << ?row <urn:col:nation:n_name> ?name >> <urn:prov:source> ?src .
        ?row <urn:fk:nation:n_regionkey> ?reg .
        ?reg <urn:col:region:r_name> "ASIA" .
      }
    """)
    return extract(r.bindings, {"name": ("name", "lex"), "src": ("src", "lex")})


@q("sparql_star_triple_fn",
   "SELECT r_name AS rname, 'urn:t:region:' || CAST(r_regionkey AS VARCHAR) "
   "AS stext FROM region")
def sparql_star_triple_fn(spark, sf_dir) -> DataFrame:
    """TRIPLE()/SUBJECT()/isTRIPLE() builtins through the text front end;
    rewrite.fold_star_accessors collapses SUBJECT(TRIPLE(...)) so the
    packed encoding never round-trips (plan stays under the codegen
    cliff)."""
    from kineo_spark.engine import Engine

    r = Engine(_star_store(spark, sf_dir)).query("""
      SELECT ?rname ?stext WHERE {
        ?r <urn:col:region:r_name> ?rname .
        BIND(TRIPLE(?r, <urn:col:region:r_name>, ?rname) AS ?t)
        FILTER(isTRIPLE(?t))
        BIND(STR(SUBJECT(?t)) AS ?stext)
      }
    """)
    return extract(r.bindings, {"rname": ("rname", "lex"),
                                "stext": ("stext", "lex")})


@q("sparql_star_id_annotation",
   "SELECT n_name AS name, 'census-' || CAST(n_nationkey % 3 AS VARCHAR) AS src "
   "FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'")
def sparql_star_id_annotation(spark, sf_dir) -> DataFrame:
    """The annotation query through the dictionary-encoded path: quoted
    terms intern as xxhash64 ids like any term; lazy materialization
    restores the packed struct only where the accessor constraints read
    it. Same oracle as the term-mode twin."""
    from kineo_spark.dictionary import id_compiler
    from kineo_spark.engine import Engine

    eng = Engine(_star_store(spark, sf_dir))
    eng.compiler = id_compiler(eng.store)
    r = eng.query("""
      SELECT ?name ?src WHERE {
        << ?row <urn:col:nation:n_name> ?name >> <urn:prov:source> ?src .
        ?row <urn:fk:nation:n_regionkey> ?reg .
        ?reg <urn:col:region:r_name> "ASIA" .
      }
    """)
    return extract(r.bindings, {"name": ("name", "lex"), "src": ("src", "lex")})
