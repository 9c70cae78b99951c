"""Corpus ranking operators: TF-IDF term weighting and BM25 scoring.

Part of the LLM-pipeline extension (no reference analog — the reference
is a SPARQL engine): retrieval-style scoring is how large corpora get
quality-filtered and query-subset-selected before training.

Scale design (the 100 TB story):
- term statistics are two hash aggregations (tf per (doc, term), df per
  term) — classic map-side-combinable shuffles on small keys;
- corpus scalars (N, avgdl) ride along as a broadcast one-row join, no
  driver-side collect;
- ranking is a per-doc window (top-k) — partitioned by doc, never a
  global sort;
- everything is built-in Column expressions (whole-stage codegen), no
  Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kineo_spark.pipeline.text import tokens


def term_counts(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl): per-document lowercase term frequencies
    plus the document token length."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("w"),
    ).select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
    return toks.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf with
    idf = ln(N / df). Returns (doc_id, term, score) rounded to 6
    decimals; ties rank by term for determinism."""
    tf = term_counts(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", F.round("raw", 6).alias("score"))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 20,
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) document scores for a bag of query
    terms: sum over terms of idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)),
    idf = ln(1 + (N-df+0.5)/(df+0.5)). Query terms broadcast; returns
    the `top` docs as (doc_id, score) rounded to 6 decimals."""
    tf = term_counts(df, id_col, text_col)
    qt = tf.filter(F.col("term").isin(*[t.lower() for t in query_terms]))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.select(F.count(F.lit(1)).alias("n")).crossJoin(
        tf.select("doc_id", "dl").distinct().agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        qt.join(F.broadcast(dfreq.filter(
            F.col("term").isin(*[t.lower() for t in query_terms]))), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("raw"))
    )
    return (
        scored.orderBy(F.desc("raw"), F.col("doc_id"))
        .limit(top)
        .select("doc_id", F.round("raw", 6).alias("score"))
    )
