"""Data-selection operators for training-corpus curation: Gopher-style
rule filters, per-source caps, deterministic global shuffle, and DSIR
hashed-n-gram importance weighting.

Part of the LLM-pipeline extension (no reference analog — the reference
is a SPARQL engine). Public-literature lineage:
- rule filters: Rae et al. 2021 (Gopher), §A1.1 quality heuristics;
- per-domain caps: Common Crawl curation practice (cap documents per
  registered domain so no single host dominates the corpus);
- DSIR: Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling" — hashed n-gram features, importance weight =
  log ratio of target vs raw unigram/bigram bucket distributions.

Scale design (the 100 TB story):
- every rule/weight is a pure Column expression or a map-side-combinable
  count aggregation (whole-stage codegen; no Python in the hot path);
- DSIR bucket tables are ``n_buckets`` rows (constant) → broadcast to
  the scoring join, so scoring is one scan of the corpus;
- caps/shuffle order by md5 of the key — stable across runs, cluster
  sizes, and engines (the same md5 trick sampling.py uses), which is
  also what makes the DuckDB oracles exact;
- per-source caps use a window partitioned by source: at 100 TB the
  skew concern is a mega-source; partition counts stay bounded because
  the window only ranks within source and AQE splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from kineo_spark.pipeline.text import tokens

# Default English stopword probe for the Gopher "has common words" rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _word_stats(text: Column) -> tuple[Column, Column, Column]:
    """(n_words, mean_word_len, alpha_frac) over whitespace tokens."""
    w = tokens(text)
    n = F.size(w)
    total_len = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len = F.when(n > 0, total_len.cast("double") / n)
    alpha = F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.when(n > 0, alpha.cast("double") / n)
    return n, mean_len, alpha_frac


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-style repetition-free quality rules (Rae et al. 2021
    §A1.1): word-count bounds, mean-word-length band, fraction of words
    containing an alphabetic character, and a minimum number of common
    stopwords. Emits one boolean per rule plus the conjunction `keep`,
    so downstream stages can both filter and audit per-rule loss rates.

    Returns (id, n_words, mean_word_len, alpha_frac, stop_hits,
    rule_words, rule_word_len, rule_alpha, rule_stop, keep).
    """
    stopwords = stopwords or GOPHER_STOPWORDS
    text = F.col(text_col)
    n, mean_len, alpha_frac = _word_stats(text)
    w = tokens(F.lower(text))
    stop_hits = F.size(F.filter(w, lambda t: t.isin(*stopwords)))
    out = df.select(
        F.col(id_col).alias("id"),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    rule_words = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    rule_len = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    rule_alpha = F.col("alpha_frac") >= min_alpha_frac
    rule_stop = F.col("stop_hits") >= min_stop_hits
    return out.select(
        "*",
        rule_words.alias("rule_words"),
        rule_len.alias("rule_word_len"),
        rule_alpha.alias("rule_alpha"),
        rule_stop.alias("rule_stop"),
        (rule_words & rule_len & rule_alpha & rule_stop).alias("keep"),
    )


def _md5_rank_key(*cols: Column) -> Column:
    """Deterministic, engine-portable pseudo-random order key."""
    return F.md5(F.concat_ws("\x1f", *[c.cast("string") for c in cols]))


def cap_per_source(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Per-domain cap: keep at most ``cap`` documents per source,
    chosen by a deterministic md5 order over ids (a stable uniform
    sample of each source, not "first by ingest order"). One window
    shuffle partitioned by source.

    Returns the surviving (source, id, rank_in_source) rows.
    """
    w = Window.partitionBy("source").orderBy(
        _md5_rank_key(F.col("id")), F.col("id")
    )
    return (
        df.select(F.col(source_col).alias("source"), F.col(id_col).alias("id"))
        .withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= cap)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "seed0",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic training-order shuffle + shard assignment: order
    key = md5(seed ⊕ id); shard = first-8-hex-chars bucket mod
    ``n_shards``; position = rank within shard. Stable across runs and
    cluster sizes (unlike orderBy(rand())), and each shard's order is an
    independent window — no global sort at 100 TB, one shuffle
    partitioned by shard.

    Returns (id, shard, pos).
    """
    key = _md5_rank_key(F.lit(seed), F.col(id_col))
    bucket = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    shard = (bucket % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("key", "id")
    return (
        df.select(F.col(id_col).alias("id"), key.alias("key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("id", "shard", "pos")
    )


def _bucket_of(g: Column, n_buckets: int) -> Column:
    """Hashed n-gram feature bucket (DSIR featurization):
    int(md5(gram)[:8], 16) mod n_buckets — md5-based so any SQL engine
    reproduces the same buckets."""
    return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % n_buckets


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): featurize every
    document as hashed bigram buckets; estimate two multinomials over
    buckets — the TARGET distribution (documents matching ``target``)
    and the RAW distribution (all documents) — with add-one smoothing;
    a document's weight is the mean log importance ratio
    ln(p_target(b)/p_raw(b)) of its features. Resampling then keeps
    documents ∝ exp(weight) — here we return the weights themselves so
    the caller picks the sampler.

    Shape at scale: two ``n_buckets``-row count tables (broadcast), one
    explode+join+aggregate pass over the corpus. No Python, no driver
    state.

    Returns (id, n_feats, weight) — weight rounded to 6 decimals.
    """
    # materialize the token array as a real column BEFORE indexing into
    # it: an inlined tokens() expression would re-split the document on
    # every w[i] access inside the bigram lambda (O(len²) per doc)
    from kineo_spark.scale import spread_small_scan

    toks = spread_small_scan(df.select(
        F.col(id_col).alias("id"),
        target.alias("is_target"),
        F.col(text_col).alias("__t"),
    )).select(
        "id", "is_target", tokens(F.lower(F.col("__t"))).alias("w"),
    ).filter(F.size("w") >= 2)
    feats = toks.select(
        "id", "is_target",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat_ws(" ", F.col("w")[i], F.col("w")[i + 1]),
            )
        ).alias("g"),
    ).select("id", "is_target", _bucket_of(F.col("g"), n_buckets).alias("b"))
    # ONE aggregation pass yields both multinomials (raw count +
    # conditional target count per bucket) — the exploded bigram stream
    # is the expensive thing at corpus scale, so it is scanned exactly
    # twice total: once here, once in the scoring join below.
    tab_counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.count(F.when(F.col("is_target"), F.lit(1))).alias("tc"),
    )
    totals = tab_counts.agg(
        F.sum("rc").alias("rn"), F.sum("tc").alias("tn"))
    table = tab_counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("tc") + F.lit(1.0))
                  / (F.col("tn") + F.lit(float(n_buckets))))
            - F.log((F.col("rc") + F.lit(1.0))
                    / (F.col("rn") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )
    return (
        feats.select("id", "b")
        .join(F.broadcast(table), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.avg("lr"), 6).alias("weight"),
        )
    )
