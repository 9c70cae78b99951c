"""Second batch of oracle-checked queries: SAMPLE/NTILE/APPROX sketches,
regex/string/cast expression surface, term-kind tests, bound-graph
datasets, star paths, and more pipeline coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark import algebra as A
from kineo_spark.expr import c, fn, v
from kineo_spark.forms import select
from kineo_spark.model import iri, lit
from kineo_spark.queries_sparql import col, compiler_for, fk, tp
from kineo_spark.relational import extract
from kineo_spark.store import read_table

QUERIES: dict[str, callable] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None):
    def deco(f):
        QUERIES[name] = f
        if oracle is not None:
            ORACLES[name] = oracle
        return f
    return deco


@q("sparql_agg_sample",
   "SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) AS nation, "
   "MIN(n_name) AS nation_name, COUNT(*) AS n FROM customer "
   "JOIN nation ON n_nationkey = c_nationkey GROUP BY c_nationkey")
def sparql_agg_sample(spark, sf_dir) -> DataFrame:
    """SAMPLE over a per-group-constant value (deterministic; reference
    SAMPLE = any value, MaterializedQueryPlan.swift:2394-2411)."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.BGP((
            tp("cust", fk("customer", "c_nationkey"), "nat"),
            tp("nat", col("nation", "n_name"), "nname"),
        )),
        groups=(v("nat"),), group_names=("nat",),
        aggs=(
            ("nation_name", A.AggSpec("SAMPLE", v("nname"))),
            ("n", A.AggSpec("COUNT*")),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg)), {
        "nation": ("nat", "lex"), "nation_name": ("nation_name", "lex"),
        "n": ("n", "int"),
    })


@q("sparql_window_ntile",
   "SELECT c_name AS name, CAST(ntile(4) OVER "
   "(ORDER BY c_acctbal DESC, c_name) AS BIGINT) AS quartile FROM customer")
def sparql_window_ntile(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Window(
        A.BGP((
            tp("cust", col("customer", "c_name"), "name"),
            tp("cust", col("customer", "c_acctbal"), "bal"),
        )),
        functions=(
            ("quartile", A.WindowSpec(
                "NTILE", n=4,
                order=(A.SortComparator(v("bal"), False), A.SortComparator(v("name"), True)),
            )),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "quartile"))), {
        "name": ("name", "lex"), "quartile": ("quartile", "int"),
    })


@q("sparql_approx_count_distinct",
   # ε-band oracle: the sketch estimate is engine-specific, so the
   # hash-checked values are the EXACT count (independently computed by
   # both engines) plus a boolean pinning |approx-exact| <= 5%·exact
   # (HLL++ rsd at default precision is ~2.3%; 5% ≈ 2σ headroom). A
   # broken sketch flips the boolean and the hash diverges.
   "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts, "
   "TRUE AS within_eps FROM lineitem")
def sparql_approx_count_distinct(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.Triple(tp("li", fk("lineitem", "l_partkey"), "part")),
        groups=(), group_names=(),
        aggs=(("approx_parts", A.AggSpec("APPROX_COUNT_DISTINCT", v("part"))),
              ("exact_parts", A.AggSpec("COUNT", v("part"), distinct=True))),
    )
    df = extract(select(comp, A.SelectQuery(alg)), {
        "approx_parts": ("approx_parts", "int"),
        "exact_parts": ("exact_parts", "int"),
    })
    return df.select(
        "exact_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts"))
         <= 0.05 * F.col("exact_parts")).alias("within_eps"))


@q("sparql_regex_filter",
   "SELECT c_name AS name FROM customer WHERE regexp_matches(c_name, 'Customer#0*1{2}')")
def sparql_regex_filter(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Filter(
        A.Triple(tp("cust", col("customer", "c_name"), "name")),
        fn("REGEX", v("name"), c(lit("Customer#0*1{2}"))),
    )
    return extract(select(comp, A.SelectQuery(alg, ("name",))), {"name": ("name", "lex")})


@q("sparql_str_before_after",
   "SELECT c_name AS name, split_part(c_name, '#', 1) AS before_hash, "
   "split_part(c_name, '#', 2) AS after_hash, "
   "CAST(CAST(split_part(c_name, '#', 2) AS BIGINT) AS BIGINT) AS custnum "
   "FROM customer")
def sparql_str_before_after(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.Extend(
            A.Extend(
                A.Triple(tp("cust", col("customer", "c_name"), "name")),
                fn("STRBEFORE", v("name"), c(lit("#"))), "before_hash",
            ),
            fn("STRAFTER", v("name"), c(lit("#"))), "after_hash",
        ),
        fn("CAST", fn("STRAFTER", v("name"), c(lit("#"))), to="integer"), "custnum",
    )
    return extract(
        select(comp, A.SelectQuery(alg, ("name", "before_hash", "after_hash", "custnum"))),
        {
            "name": ("name", "lex"), "before_hash": ("before_hash", "lex"),
            "after_hash": ("after_hash", "lex"), "custnum": ("custnum", "int"),
        },
    )


@q("sparql_coalesce_optional",
   "SELECT n_name AS nation, COALESCE(c_mktsegment, 'none') AS seg FROM nation "
   "LEFT JOIN customer ON c_nationkey = n_nationkey AND c_acctbal > 9900")
def sparql_coalesce_optional(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.LeftJoin(
            A.Triple(tp("nat", col("nation", "n_name"), "nation")),
            A.BGP((
                tp("cust", fk("customer", "c_nationkey"), "nat"),
                tp("cust", col("customer", "c_mktsegment"), "segment"),
                tp("cust", col("customer", "c_acctbal"), "bal"),
            )),
            expr=v("bal") > c(lit(9900)),
        ),
        fn("COALESCE", v("segment"), c(lit("none"))),
        "seg",
    )
    return extract(select(comp, A.SelectQuery(alg, ("nation", "seg"))), {
        "nation": ("nation", "lex"), "seg": ("seg", "lex"),
    })


@q("sparql_term_kind_tests",
   "SELECT CAST(COUNT(*) * 3 AS BIGINT) AS literal_quads FROM nation")
def sparql_term_kind_tests(spark, sf_dir) -> DataFrame:
    """ISLITERAL over every quad of the nation graph (3 literal columns
    per row; type + FK objects are IRIs)."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.Filter(
            A.NamedGraph(
                iri("urn:g:nation"),
                A.Triple(tp("s", A.Var("p"), "o")),
            ),
            fn("ISLITERAL", v("o")),
        ),
        groups=(), group_names=(),
        aggs=(("literal_quads", A.AggSpec("COUNT*")),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {"literal_quads": ("literal_quads", "int")})


@q("sparql_path_star_bound",
   "SELECT 'urn:t:customer:1' AS dst "
   "UNION ALL SELECT 'urn:t:nation:' || CAST(c_nationkey AS VARCHAR) "
   "FROM customer WHERE c_custkey = 1 "
   "UNION ALL SELECT 'urn:t:region:' || CAST(n_regionkey AS VARCHAR) "
   "FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = 1")
def sparql_path_star_bound(spark, sf_dir) -> DataFrame:
    """(fk_cust_nat | fk_nat_reg)* from a bound subject: zero-length
    self + 1-hop nation + 2-hop region."""
    comp = compiler_for(spark, sf_dir)
    alg = A.PathPattern(
        iri("urn:t:customer:1"),
        A.PStar(A.PAlt(A.PLink(fk("customer", "c_nationkey")), A.PLink(fk("nation", "n_regionkey")))),
        A.Var("dst"),
    )
    return extract(select(comp, A.SelectQuery(alg, ("dst",))), {"dst": ("dst", "lex")})


@q("sparql_graph_bound_scan",
   "SELECT CAST(COUNT(*) * 3 AS BIGINT) AS n FROM region")
def sparql_graph_bound_scan(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Aggregate(
        A.NamedGraph(iri("urn:g:region"), A.Triple(tp("s", A.Var("p"), "o"))),
        groups=(), group_names=(),
        aggs=(("n", A.AggSpec("COUNT*")),),
    )
    return extract(select(comp, A.SelectQuery(alg)), {"n": ("n", "int")})


@q("sparql_hash_functions",
   "SELECT r_name AS name, md5(r_name) AS h_md5, sha256(r_name) AS h_sha256 FROM region")
def sparql_hash_functions(spark, sf_dir) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    alg = A.Extend(
        A.Extend(
            A.Triple(tp("reg", col("region", "r_name"), "name")),
            fn("MD5", v("name")), "h_md5",
        ),
        fn("SHA256", v("name")), "h_sha256",
    )
    return extract(select(comp, A.SelectQuery(alg, ("name", "h_md5", "h_sha256"))), {
        "name": ("name", "lex"), "h_md5": ("h_md5", "lex"), "h_sha256": ("h_sha256", "lex"),
    })


@q("sparql_text_end_to_end",
   "SELECT n_name AS nation, COUNT(*) AS n_suppliers, "
   "ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(25,6))) AS DOUBLE), 6) AS total_bal "
   "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
   "GROUP BY n_name HAVING COUNT(*) >= 1")
def sparql_text_end_to_end(spark, sf_dir) -> DataFrame:
    """Full text path: SPARQL string → parser → rewrite → compiler →
    Catalyst (what a reference user actually types)."""
    from kineo_spark.engine import Engine
    from kineo_spark.queries_sparql import _STORES, compiler_for

    comp = compiler_for(spark, sf_dir)
    engine = Engine(comp.store)
    result = engine.query("""
      SELECT ?nation (COUNT(*) AS ?n_suppliers) (SUM(?bal) AS ?total_bal)
      WHERE {
        ?sup <urn:fk:supplier:s_nationkey> ?nat ;
             <urn:col:supplier:s_acctbal> ?bal .
        ?nat <urn:col:nation:n_name> ?nation .
      }
      GROUP BY ?nation
      HAVING (?n_suppliers >= 1)
    """)
    df = result.bindings
    # the parser defaults SUM/AVG to exact decimal accumulation, so the
    # engine's own aggregate hash-matches; round(6) only mirrors the
    # oracle's ROUND
    from pyspark.sql import functions as F
    return df.select(
        df["nation"]["lex"].alias("nation"),
        df["n_suppliers"]["num"].cast("long").alias("n_suppliers"),
        F.round(df["total_bal"]["num"], 6).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Pipeline additions
# ---------------------------------------------------------------------------

@q("pipe_bpe_token_count",
   r"SELECT doc_id, CAST(len(regexp_extract_all(text, "
   r"'([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS BIGINT) AS n_bpe FROM documents")
def pipe_bpe_token_count(spark, sf_dir) -> DataFrame:
    from kineo_spark.pipeline.text import bpe_ish_token_count

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe"))


@q("pipe_embedding_norm_stats",
   "SELECT label, COUNT(*) AS n, "
   "CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
   "CAST(embedding AS DOUBLE[]))) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_norm "
   "FROM embeddings GROUP BY label")
def pipe_embedding_norm_stats(spark, sf_dir) -> DataFrame:
    from kineo_spark.pipeline.similarity import _norm

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("nrm").cast("decimal(25,6)")).cast("double")
             / F.count(F.lit(1))).alias("avg_norm"),
        )
    )


@q("pipe_dedup_keep_best",
   "WITH ranked AS (SELECT doc_id, lang, n_chars, "
   "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
   "FROM documents) SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 3")
def pipe_dedup_keep_best(spark, sf_dir) -> DataFrame:
    """Keep-best-per-group (the canonical post-dedup selection step)."""
    from kineo_spark.pipeline.sessions import top_k_by_group

    docs = read_table(spark, sf_dir, "documents")
    return top_k_by_group(
        docs.select("doc_id", "lang", "n_chars"), "lang", "n_chars", 3, "doc_id"
    )


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

@q("sparql_rdfxml_roundtrip",
   f"SELECT 'urn:col:region:r_name' AS p, COUNT(*) AS n FROM region "
   f"UNION ALL SELECT 'urn:col:region:r_regionkey', COUNT(*) FROM region "
   f"UNION ALL SELECT '{_RDF_TYPE}', COUNT(*) FROM region")
def sparql_rdfxml_roundtrip(spark, sf_dir) -> DataFrame:
    """RDF/XML source loader (reference RDF/RDFXML.swift:14-522): export
    the region graph to RDF/XML text, parse it back with the SAX loader,
    count triples per predicate — checked against the original table."""
    from kineo_spark.queries_sparql import _STORES
    from kineo_spark.sources.rdfxml import load_rdfxml, serialize_rdfxml

    store = compiler_for(spark, sf_dir).store
    quads = store.scan(A.QuadPattern(A.Var("s"), A.Var("p"), A.Var("o"),
                                     iri("urn:g:region")))
    flat = quads.select(
        quads["s"]["kind"].alias("s_kind"), quads["s"]["lex"].alias("s_lex"),
        quads["p"]["lex"].alias("p_lex"),
        quads["o"]["kind"].alias("o_kind"), quads["o"]["lex"].alias("o_lex"),
        quads["o"]["dt"].alias("o_dt"), quads["o"]["lang"].alias("o_lang"),
        quads["o"]["num"].alias("o_num"), F.lit("urn:g:region").alias("g_lex"),
    )
    xml_text = serialize_rdfxml(flat)
    reloaded = load_rdfxml(spark, xml_text, default_graph="urn:g:region")
    return reloaded.groupBy(F.col("p_lex").alias("p")).agg(
        F.count(F.lit(1)).alias("n")
    )


@q("sparql_update_modify",
   "SELECT n_name AS name, r_name AS region FROM nation "
   "JOIN region ON n_regionkey = r_regionkey")
def sparql_update_modify(spark, sf_dir) -> DataFrame:
    """SPARQL 1.1 Update end to end (extension — the reference declares
    sparqlUpdate11 but never evaluates it, QueryPlanner.swift:1075-1076):
    build a GraphStore over the nation+region quads, run a DELETE/INSERT
    WHERE that denormalizes each nation's region name onto the nation
    row, then query the POST-state. The oracle is the equivalent join on
    the original tables."""
    from kineo_spark.store import RelationalQuadStore
    from kineo_spark.update import GraphStore

    quads = RelationalQuadStore(
        spark, sf_dir, tables=["nation", "region"]).quads()
    gs = GraphStore(spark, quads).update(
        "DELETE { ?n <urn:fk:nation:n_regionkey> ?r } "
        "INSERT { ?n <urn:col:nation:region_name> ?rn } "
        "WHERE { ?n <urn:fk:nation:n_regionkey> ?r . "
        "?r <urn:col:region:r_name> ?rn }"
    )
    res = gs.query(
        "SELECT ?name ?region WHERE { "
        "?n <urn:col:nation:n_name> ?name . "
        "?n <urn:col:nation:region_name> ?region }"
    )
    return extract(res.bindings, {
        "name": ("name", "lex"), "region": ("region", "lex"),
    })


@q("sparql_stream_select",
   "SELECT 'urn:t:events:' || CAST(event_id AS VARCHAR) AS e, value AS v "
   "FROM events WHERE event_type = 'purchase' AND value > 50")
def sparql_stream_select(spark, sf_dir) -> DataFrame:
    """Continuous SPARQL (extension — the reference has no streaming,
    SURVEY §2.11): compile a SELECT with a 2-pattern BGP self-join +
    FILTER against the STREAMING events→quads DataFrame, drain it with
    an availableNow trigger, and return the flat bindings. The oracle is
    the equivalent relational filter — proving the incremental plan
    emits exactly the batch answer."""
    import uuid

    from kineo_spark.streaming import events as se
    from kineo_spark.streaming import sparql as ss

    # micro-batch file source over the same parquet the oracle reads
    # (single-file source: glob-filter the table dir; ts is raw nanos-
    # as-long under the session's parquet config but quads don't use it)
    events = (
        spark.readStream
        .schema("event_id long, ts long, user_id long, "
                "event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    quads = se.events_to_quads(events)
    bindings = ss.continuous_query(spark, quads, """
      SELECT ?e ?v WHERE {
        ?e <urn:col:events:event_type> "purchase" .
        ?e <urn:col:events:value> ?v .
        FILTER(?v > 50)
      }
    """)
    name = f"t_stream_sel_{uuid.uuid4().hex[:8]}"
    # state partitions sized to batch volume (~150k events / ~40k rows
    # per store — r12 re-measure: 2→1.50s, 4→1.58s, 8→1.79s best-of-3;
    # per-store open/commit fixed cost dominates small state, so fewer,
    # fuller stores win; a production stream re-derives this from its
    # own volume as run_available_now documents)
    out = ss.run_available_now(bindings, name, timeout_s=300,
                               state_partitions=4)
    return out.select(
        F.col("e")["lex"].alias("e"), F.col("v")["num"].alias("v")
    )


@q("sparql_window_median",
   "SELECT o_orderkey AS orderkey, "
   "CAST(median(o_totalprice) OVER (PARTITION BY o_custkey) AS DOUBLE) AS med "
   "FROM orders")
def sparql_window_median(spark, sf_dir) -> DataFrame:
    """Custom window function via the registry (extension — the
    reference throws on custom windows, MaterializedQueryPlan.swift:
    942-943): per-customer median order value over an unbounded frame.
    Median is pure selection (+ one midpoint average), so Spark and
    DuckDB agree bit-exactly — no accumulation-order drift."""
    comp = compiler_for(spark, sf_dir)
    alg = A.Window(
        A.BGP((
            tp("ord", col("orders", "o_orderkey"), "okey"),
            tp("ord", fk("orders", "o_custkey"), "cust"),
            tp("ord", col("orders", "o_totalprice"), "price"),
        )),
        functions=(
            ("med", A.WindowSpec("MEDIAN", expr=v("price"), partition=(v("cust"),))),
        ),
    )
    return extract(select(comp, A.SelectQuery(alg, ("okey", "med"))), {
        "orderkey": ("okey", "int"), "med": ("med", "num"),
    })


@q("sparql_stream_windowed_agg",
   "WITH m AS (SELECT MAX(epoch(ts)) AS mx FROM events) "
   "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, "
   "       event_type AS et, COUNT(*) AS n "
   "FROM events CROSS JOIN m "
   "GROUP BY 1, 2, m.mx "
   "HAVING epoch(date_trunc('hour', MIN(ts))) + 3600 <= m.mx")
def sparql_stream_windowed_agg(spark, sf_dir) -> DataFrame:
    """Continuous windowed SPARQL aggregate, ORACLE-CHECKED: hourly
    COUNT per event type over the streaming events→quads mapping with
    a 0s watermark; append mode emits exactly the CLOSED windows
    (window end <= max event time), which the SQL oracle reproduces
    with a HAVING over the global max timestamp."""
    import uuid

    from kineo_spark.streaming import events as se
    from kineo_spark.streaming import sparql as ss

    stream = (
        spark.readStream
        .schema("event_id long, ts long, user_id long, "
                "event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    quads = se.events_to_quads(stream, with_time=True)
    out = ss.continuous_aggregate(
        spark, quads,
        """SELECT ?et (COUNT(?e) AS ?n) WHERE {
             ?e <urn:col:events:event_type> ?et .
             ?e <urn:col:events:ts> ?t
           } GROUP BY ?et""",
        time_var="t", window_duration="1 hour",
        watermark_delay="0 seconds")
    name = f"t_stream_wagg_{uuid.uuid4().hex[:8]}"
    q_ = (out.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True).start())
    q_.awaitTermination(300)
    return spark.table(name).select(
        "window_start",
        F.col("et")["lex"].alias("et"),
        F.col("n")["num"].cast("long").alias("n"),
    )
