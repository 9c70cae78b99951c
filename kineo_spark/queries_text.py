"""SPARQL *text* twins of the algebra-built oracle queries.

Every entry here is the same query as its ``sparql_*`` twin in
queries_sparql.py, but expressed as a SPARQL 1.1 string and run through
the full user-facing stack: text → parser → rewrite → compiler →
Catalyst (reference: the swift-sparql-syntax front end consumed by
Kineo's QueryParser, SPARQLSyntax → Algebra). The oracle SQL is shared
with the algebra twin, so the driver hash-checks that the text path and
the algebra path agree with DuckDB — pinning the parser's semantics
(precedence, literal typing, path expansion, aggregate flags), not just
its ability to parse.

Window functions are the one family with no twin: SPARQL has no window
syntax (the reference exposes them via algebra extensions only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kineo_spark.relational import extract

QUERIES: dict[str, callable] = {}
ORACLES: dict[str, str] = {}


def _engine(spark, sf_dir):
    from kineo_spark.engine import Engine
    from kineo_spark.queries_sparql import compiler_for

    return Engine(compiler_for(spark, sf_dir).store)


def _reg(name: str, text: str, spec: dict, oracle_of: str | None):
    def f(spark, sf_dir, _t=text, _s=spec) -> DataFrame:
        r = _engine(spark, sf_dir).query(_t)
        if r.form == "ask":
            return spark.createDataFrame([(r.boolean,)], "ask boolean")
        df = r.bindings if r.form == "select" else r.triples
        return extract(df, _s)

    f.__name__ = name
    QUERIES[name] = f
    if oracle_of is not None:
        from kineo_spark.queries_sparql import ORACLES as _O

        ORACLES[name] = _O[oracle_of]


_PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"

# -- scans / filter / order ------------------------------------------------

_reg("sparql_text_scan_project", """
  SELECT ?name ?segment WHERE {
    ?c <urn:col:customer:c_name> ?name ;
       <urn:col:customer:c_mktsegment> ?segment .
  }
""", {"name": ("name", "lex"), "segment": ("segment", "lex")},
     "sparql_scan_project")

_reg("sparql_text_filter_order_limit", """
  SELECT ?name ?bal WHERE {
    ?c <urn:col:customer:c_name> ?name ;
       <urn:col:customer:c_acctbal> ?bal .
    FILTER(?bal > 8000)
  } ORDER BY DESC(?bal) ?name LIMIT 10
""", {"name": ("name", "lex"), "bal": ("bal", "num")},
     "sparql_filter_order_limit")

_reg("sparql_text_bgp_3hop_join", """
  SELECT ?name ?nation ?region ?bal WHERE {
    ?cust <urn:col:customer:c_name> ?name ;
          <urn:col:customer:c_acctbal> ?bal ;
          <urn:fk:customer:c_nationkey> ?nat .
    ?nat <urn:col:nation:n_name> ?nation ;
         <urn:fk:nation:n_regionkey> ?reg .
    ?reg <urn:col:region:r_name> ?region .
    FILTER(?bal > 7500)
  }
""", {"name": ("name", "lex"), "nation": ("nation", "lex"),
      "region": ("region", "lex"), "bal": ("bal", "num")},
     "sparql_bgp_3hop_join")

# -- optional / union / minus / exists / distinct / values / bind ----------

_reg("sparql_text_optional_leftjoin", """
  SELECT ?supplier ?customer WHERE {
    ?sup <urn:col:supplier:s_name> ?supplier ;
         <urn:fk:supplier:s_nationkey> ?nat .
    OPTIONAL {
      ?cust <urn:fk:customer:c_nationkey> ?nat ;
            <urn:col:customer:c_name> ?customer ;
            <urn:col:customer:c_acctbal> ?bal .
      FILTER(?bal > 9000)
    }
  }
""", {"supplier": ("supplier", "lex"), "customer": ("customer", "lex")},
     "sparql_optional_leftjoin")

_reg("sparql_text_union", """
  SELECT ?name ?src WHERE {
    { ?x <urn:col:customer:c_name> ?name . BIND("customer" AS ?src) }
    UNION
    { ?x <urn:col:supplier:s_name> ?name . BIND("supplier" AS ?src) }
  }
""", {"name": ("name", "lex"), "src": ("src", "lex")}, "sparql_union")

_reg("sparql_text_minus", """
  SELECT ?name WHERE {
    ?cust <urn:col:customer:c_name> ?name .
    MINUS { ?ord <urn:fk:orders:o_custkey> ?cust }
  }
""", {"name": ("name", "lex")}, "sparql_minus")

_reg("sparql_text_filter_not_exists", """
  SELECT ?supplier WHERE {
    ?sup <urn:col:supplier:s_name> ?supplier ;
         <urn:fk:supplier:s_nationkey> ?nat .
    FILTER NOT EXISTS {
      ?cust <urn:fk:customer:c_nationkey> ?nat ;
            <urn:col:customer:c_acctbal> ?bal .
      FILTER(?bal > 9500)
    }
  }
""", {"supplier": ("supplier", "lex")}, "sparql_filter_not_exists")

_reg("sparql_text_distinct", """
  SELECT DISTINCT ?segment WHERE {
    ?cust <urn:col:customer:c_mktsegment> ?segment .
  }
""", {"segment": ("segment", "lex")}, "sparql_distinct")

_reg("sparql_text_values_join", """
  SELECT ?nation ?region WHERE {
    ?nat <urn:col:nation:n_name> ?nation ;
         <urn:fk:nation:n_regionkey> ?reg .
    ?reg <urn:col:region:r_name> ?region .
    VALUES ?region { "EUROPE" "ASIA" }
  }
""", {"nation": ("nation", "lex"), "region": ("region", "lex")},
     "sparql_values_join")

_reg("sparql_text_bind_extend", """
  SELECT ?orderkey ?linenumber ?revenue WHERE {
    ?li <urn:col:lineitem:l_orderkey> ?orderkey ;
        <urn:col:lineitem:l_linenumber> ?linenumber ;
        <urn:col:lineitem:l_extendedprice> ?price ;
        <urn:col:lineitem:l_discount> ?disc ;
        <urn:col:lineitem:l_quantity> ?qty .
    FILTER(?qty > 45)
    BIND(?price * (1 - ?disc) AS ?revenue)
  }
""", {"orderkey": ("orderkey", "int"), "linenumber": ("linenumber", "int"),
      "revenue": ("revenue", "num")}, "sparql_bind_extend")

# -- aggregation ------------------------------------------------------------

_reg("sparql_text_agg_q1", _PFX + """
  SELECT ?rf ?ls (SUM(?qty) AS ?sum_qty) (SUM(?price) AS ?sum_base_price)
         (AVG(?qty) AS ?avg_qty) (COUNT(*) AS ?count_order)
  WHERE {
    ?li <urn:col:lineitem:l_returnflag> ?rf ;
        <urn:col:lineitem:l_linestatus> ?ls ;
        <urn:col:lineitem:l_quantity> ?qty ;
        <urn:col:lineitem:l_extendedprice> ?price ;
        <urn:col:lineitem:l_shipdate> ?sd .
    FILTER(?sd <= "1997-06-01T00:00:00"^^xsd:dateTime)
  } GROUP BY ?rf ?ls
""", {"returnflag": ("rf", "lex"), "linestatus": ("ls", "lex"),
      "sum_qty": ("sum_qty", "num"), "sum_base_price": ("sum_base_price", "num"),
      "avg_qty": ("avg_qty", "num"), "count_order": ("count_order", "int")},
     "sparql_agg_q1")

_reg("sparql_text_agg_having", """
  SELECT ?nat (COUNT(*) AS ?n_customers) WHERE {
    ?cust <urn:fk:customer:c_nationkey> ?nat .
  } GROUP BY ?nat HAVING (?n_customers >= 5)
""", {"nation": ("nat", "lex"), "n_customers": ("n_customers", "int")},
     "sparql_agg_having")

_reg("sparql_text_agg_minmax", """
  SELECT ?nat (MIN(?bal) AS ?min_bal) (MAX(?bal) AS ?max_bal)
         (SUM(?bal) AS ?total_bal)
  WHERE {
    ?cust <urn:fk:customer:c_nationkey> ?nat ;
          <urn:col:customer:c_acctbal> ?bal .
  } GROUP BY ?nat
""", {"nation": ("nat", "lex"), "min_bal": ("min_bal", "num"),
      "max_bal": ("max_bal", "num"), "total_bal": ("total_bal", "num")},
     "sparql_agg_minmax")

_reg("sparql_text_group_concat", """
  SELECT ?region (GROUP_CONCAT(?nname; SEPARATOR=",") AS ?nations) WHERE {
    ?nat <urn:col:nation:n_name> ?nname ;
         <urn:fk:nation:n_regionkey> ?reg .
    ?reg <urn:col:region:r_name> ?region .
  } GROUP BY ?region
""", {"region": ("region", "lex"), "nations": ("nations", "lex")},
     "sparql_group_concat")

_reg("sparql_text_count_distinct", """
  SELECT ?nat (COUNT(DISTINCT ?seg) AS ?n_segments) WHERE {
    ?cust <urn:fk:customer:c_nationkey> ?nat ;
          <urn:col:customer:c_mktsegment> ?seg .
  } GROUP BY ?nat
""", {"nation": ("nat", "lex"), "n_segments": ("n_segments", "int")},
     "sparql_count_distinct")

_reg("sparql_text_subquery_join_agg", """
  SELECT ?nation ?avg_bal WHERE {
    ?nat <urn:col:nation:n_name> ?nation .
    {
      SELECT ?nat (AVG(?bal) AS ?avg_bal) WHERE {
        ?cust <urn:fk:customer:c_nationkey> ?nat ;
              <urn:col:customer:c_acctbal> ?bal .
      } GROUP BY ?nat
    }
    FILTER(?avg_bal > 4000)
  }
""", {"nation": ("nation", "lex"), "avg_bal": ("avg_bal", "num")},
     "sparql_subquery_join_agg")

# -- property paths ---------------------------------------------------------

_reg("sparql_text_path_seq", """
  SELECT ?ord ?nation WHERE {
    ?ord <urn:fk:orders:o_custkey>/<urn:fk:customer:c_nationkey> ?nation .
  }
""", {"ord": ("ord", "lex"), "nation": ("nation", "lex")}, "sparql_path_seq")

_reg("sparql_text_path_inverse", """
  SELECT ?region ?nation WHERE {
    ?region ^<urn:fk:nation:n_regionkey> ?nation .
  }
""", {"region": ("region", "lex"), "nation": ("nation", "lex")},
     "sparql_path_inverse")

_reg("sparql_text_path_alt_plus", """
  SELECT ?src ?dst WHERE {
    ?src (<urn:fk:orders:o_custkey>|<urn:fk:customer:c_nationkey>|<urn:fk:nation:n_regionkey>)+ ?dst .
  }
""", {"src": ("src", "lex"), "dst": ("dst", "lex")}, "sparql_path_alt_plus")

_reg("sparql_text_path_zero_or_one", """
  SELECT ?dst WHERE {
    GRAPH <urn:g:nation> { <urn:t:nation:0> <urn:fk:nation:n_regionkey>? ?dst }
  }
""", {"dst": ("dst", "lex")}, "sparql_path_zero_or_one")

_reg("sparql_text_path_nps", """
  SELECT ?s ?o WHERE {
    GRAPH <urn:g:nation> { ?s !(<urn:fk:nation:n_regionkey>) ?o }
  }
""", {"s": ("s", "lex"), "o": ("o", "lex")}, "sparql_path_nps")

# -- query forms & dataset --------------------------------------------------

_reg("sparql_text_ask", """
  ASK { ?cust <urn:col:customer:c_acctbal> ?bal . FILTER(?bal > 9000) }
""", {}, "sparql_ask")

_reg("sparql_text_construct", """
  CONSTRUCT { ?cust <urn:p:inNation> ?nname } WHERE {
    ?cust <urn:fk:customer:c_nationkey> ?nat .
    ?nat <urn:col:nation:n_name> ?nname .
  }
""", {"s": ("s", "lex"), "p": ("p", "lex"), "o": ("o", "lex")},
     "sparql_construct")

_reg("sparql_text_describe", "DESCRIBE <urn:t:region:0>",
     {"s": ("s", "lex"), "p": ("p", "lex"), "o": ("o", "lex")},
     "sparql_describe")

_reg("sparql_text_graph_stats", """
  SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g
""", {"g": ("g", "lex"), "n": ("n", "int")}, "sparql_graph_stats")

# -- expression surface -----------------------------------------------------

_reg("sparql_text_expr_strings", """
  SELECT ?name ?uname ?name_len ?prefix ?name_md5 ?short_name WHERE {
    ?cust <urn:col:customer:c_name> ?name .
    FILTER(CONTAINS(?name, "00001"))
    BIND(UCASE(?name) AS ?uname)
    BIND(STRLEN(?name) AS ?name_len)
    BIND(SUBSTR(?name, 1, 8) AS ?prefix)
    BIND(MD5(?name) AS ?name_md5)
    BIND(REPLACE(?name, "Customer", "C") AS ?short_name)
  }
""", {"name": ("name", "lex"), "uname": ("uname", "lex"),
      "name_len": ("name_len", "int"), "prefix": ("prefix", "lex"),
      "name_md5": ("name_md5", "lex"), "short_name": ("short_name", "lex")},
     "sparql_expr_strings")

_reg("sparql_text_expr_datetime", """
  SELECT ?okey ?y ?m ?d WHERE {
    ?ord <urn:col:orders:o_orderkey> ?okey ;
         <urn:col:orders:o_orderdate> ?odate .
    BIND(YEAR(?odate) AS ?y)
    BIND(MONTH(?odate) AS ?m)
    BIND(DAY(?odate) AS ?d)
    FILTER(MONTH(?odate) = 1)
  }
""", {"orderkey": ("okey", "int"), "y": ("y", "int"), "m": ("m", "int"),
      "d": ("d", "int")}, "sparql_expr_datetime")

_reg("sparql_text_expr_conditional", """
  SELECT ?name ?tier WHERE {
    ?cust <urn:col:customer:c_name> ?name ;
          <urn:col:customer:c_acctbal> ?bal .
    BIND(IF(?bal > 5000, "high", "low") AS ?tier)
  }
""", {"name": ("name", "lex"), "tier": ("tier", "lex")},
     "sparql_expr_conditional")

_reg("sparql_text_reduced", """
  SELECT REDUCED ?segment ?nat WHERE {
    ?cust <urn:col:customer:c_mktsegment> ?segment ;
          <urn:fk:customer:c_nationkey> ?nat .
  }
""", {"segment": ("segment", "lex"), "nation": ("nat", "lex")},
     "sparql_reduced")

# -- FROM / FROM NAMED dataset scoping (SPARQL 1.1 §13.2) ------------------
# these have their own oracle SQL (no algebra twin: datasets are a
# text-level construct routed through Engine → DatasetGraphStore)

_reg("sparql_text_from_graph", """
  SELECT ?name ?key FROM <urn:g:nation> WHERE {
    ?n <urn:col:nation:n_name> ?name ;
       <urn:col:nation:n_nationkey> ?key .
  }
""", {"name": ("name", "lex"), "key": ("key", "int")}, None)
ORACLES["sparql_text_from_graph"] = (
    "SELECT n_name AS name, CAST(n_nationkey AS BIGINT) AS key FROM nation")

_reg("sparql_text_from_named", """
  SELECT ?g ?name FROM NAMED <urn:g:region> WHERE {
    GRAPH ?g { ?r <urn:col:region:r_name> ?name }
  }
""", {"g": ("g", "lex"), "name": ("name", "lex")}, None)
ORACLES["sparql_text_from_named"] = (
    "SELECT 'urn:g:region' AS g, r_name AS name FROM region")


# -- round-3 parser/expression features with their own oracles -------------

_reg("sparql_text_values_final", """
  SELECT ?name ?segment WHERE {
    ?c <urn:col:customer:c_name> ?name ;
       <urn:col:customer:c_mktsegment> ?segment .
  }
  VALUES ?segment { "BUILDING" "MACHINERY" }
""", {"name": ("name", "lex"), "segment": ("segment", "lex")}, None)
ORACLES["sparql_text_values_final"] = (
    "SELECT c_name AS name, c_mktsegment AS segment FROM customer "
    "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')"
)

_reg("sparql_text_regex_flags", """
  SELECT ?name WHERE {
    ?c <urn:col:customer:c_name> ?name
    FILTER(REGEX(?name, "customer#00000001", "iq"))
  }
""", {"name": ("name", "lex")}, None)
ORACLES["sparql_text_regex_flags"] = (
    "SELECT c_name AS name FROM customer "
    "WHERE contains(lower(c_name), 'customer#00000001')"
)

_reg("sparql_text_expr_timezone", """
  SELECT ?eid ?tzd ?tz WHERE {
    ?ev <urn:col:events:event_id> ?eid ;
        <urn:col:events:ts> ?when .
    FILTER(?eid <= 200)
    BIND(TIMEZONE(?when) AS ?tzd)
    BIND(TZ(?when) AS ?tz)
  }
""", {"eid": ("eid", "int"), "tzd": ("tzd", "lex"), "tz": ("tz", "lex")},
     "sparql_expr_timezone")

_reg("sparql_text_duration_compare", _PFX + """
  SELECT ?x WHERE {
    VALUES (?x ?d1 ?d2) {
      (1 "P1Y"^^xsd:duration "P13M"^^xsd:duration)
      (2 "PT1H"^^xsd:dayTimeDuration "PT61M"^^xsd:dayTimeDuration)
      (3 "P1M"^^xsd:duration "P30D"^^xsd:duration)
      (4 "P2D"^^xsd:dayTimeDuration "PT48H"^^xsd:dayTimeDuration)
      (5 "P1Y2M"^^xsd:yearMonthDuration "P1Y3M"^^xsd:yearMonthDuration)
      (6 "bogus"^^xsd:duration "P1D"^^xsd:duration)
    }
    FILTER(?d1 < ?d2)
  }
""", {"x": ("x", "int")}, None)
ORACLES["sparql_text_duration_compare"] = (
    "SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT 2 UNION ALL SELECT 5"
)
