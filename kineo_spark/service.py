"""SERVICE federation (SURVEY §2.10).

Reference: the sub-algebra is serialized back to SPARQL, sent over HTTP,
and the returned bindings joined in (QueryPlanner.swift:819-833;
MaterializedQueryPlan.swift:669-703; SPARQLClient.swift:14-99). SILENT
degrades to a single empty solution on error (SPARQLClient.swift:90-97).

Spark shape: the HTTP round-trip happens on the driver (it is inherently
a single remote call), the result rows become a small DataFrame that
Catalyst will typically broadcast into the enclosing join.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql import types as T

from kineo_spark import algebra as A
from kineo_spark.model import KIND_BLANK, KIND_IRI, KIND_LITERAL, IRI_DT, NUMERIC_DTS, TERM_SCHEMA


def _term_from_json(d: dict):
    if d is None:
        return None
    typ = d.get("type")
    val = d.get("value", "")
    if typ == "uri":
        return (KIND_IRI, val, None, None, None)
    if typ == "bnode":
        return (KIND_BLANK, val, None, None, None)
    lang = d.get("xml:lang")
    if lang:
        return (KIND_LITERAL, val, "langString", lang, None)
    dt_iri = d.get("datatype")
    dt = IRI_DT.get(dt_iri, dt_iri) if dt_iri else "string"
    num = None
    if dt in NUMERIC_DTS:
        try:
            num = float(val)
        except ValueError:
            num = None
    return (KIND_LITERAL, val, dt, None, num)


def fetch_bindings(endpoint: str, sparql: str, timeout: int = 30):
    """POST a SPARQL query, parse application/sparql-results+json."""
    data = urllib.parse.urlencode({"query": sparql}).encode()
    req = urllib.request.Request(
        endpoint, data=data,
        headers={"Accept": "application/sparql-results+json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.load(resp)
    variables = payload["head"]["vars"]
    rows = []
    for b in payload["results"]["bindings"]:
        rows.append(tuple(_term_from_json(b.get(v)) for v in variables))
    return variables, rows


def eval_service(compiler, node: A.Service):
    from kineo_spark.compiler import Plan
    from kineo_spark.sparql_text import algebra_to_sparql

    try:
        sparql = algebra_to_sparql(node.child)
        variables, rows = fetch_bindings(node.endpoint, sparql)
        schema = T.StructType([T.StructField(v, TERM_SCHEMA) for v in variables])
        df = compiler.spark.createDataFrame(rows, schema)
        return Plan(df, frozenset())
    except Exception:
        if node.silent:
            return Plan(compiler.spark.range(1).drop("id"), frozenset())
        raise
