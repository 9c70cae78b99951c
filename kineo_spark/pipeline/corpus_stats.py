"""Corpus-level statistics operators: OOV rate against an induced
vocabulary, document n-gram novelty, and the Zipf law slope.

Part of the LLM-pipeline extension. These are the health checks run on
every large pretraining corpus: OOV rate says how well a fixed
vocabulary covers the text, novelty finds documents contributing
unique content (vs boilerplate), the Zipf slope (~ -1 for natural
language) is a cheap corpus-degeneracy alarm — scraped spam and
template farms bend it.

Scale shapes: everything is count aggregations over the exploded token
or n-gram stream (map-side combinable) plus a broadcast of a small
derived table (the vocabulary, the regression moments). No Python in
the hot path; determinism via (count desc, term asc) tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kineo_spark.pipeline.text import ngrams_of, tokens


def oov_rate(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    vocab_size: int = 100,
) -> DataFrame:
    """Fraction of each document's tokens outside the corpus's own
    top-``vocab_size`` vocabulary (rank by frequency desc, term asc).
    Returns (doc_id, n_tokens, oov_frac)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.col("term"))
    vocab = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= vocab_size)
        .select("term")
    )
    return (
        toks.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.count(F.when(F.col("__in").isNull(), F.lit(1)))
                .cast("double") / F.count(F.lit(1)), 6,
            ).alias("oov_frac"),
        )
    )


def novelty(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
) -> DataFrame:
    """Fraction of a document's DISTINCT word n-grams appearing in no
    other document — high for unique content, ~0 for boilerplate.
    Returns (doc_id, n_grams, novel_frac)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("w"),
    )
    grams = toks.select(
        "doc_id", F.explode(ngrams_of(F.col("w"), n)).alias("gram")
    ).dropDuplicates(["doc_id", "gram"])
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    return (
        grams.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.count(F.when(F.col("gdf") == 1, F.lit(1)))
                .cast("double") / F.count(F.lit(1)), 6,
            ).alias("novel_frac"),
        )
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top: int = 200,
) -> DataFrame:
    """Least-squares slope of ln(freq) on ln(rank) over the top
    ``top`` corpus terms (Zipf's law predicts ≈ -1 for natural text).
    The regression moments are written out explicitly (Σx, Σy, Σxy,
    Σx²) so any SQL engine computes the bit-identical slope — built-in
    regr_slope implementations differ in formulation.
    Returns one row (n_terms, slope)."""
    counts = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.col("term"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("n").cast("double")).alias("y"),
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")), 6,
        ).alias("slope"),
    )
