"""BPE (byte-pair encoding) vocabulary induction over a corpus.

The Sennrich et al. 2016 subword algorithm, re-expressed for Spark.
Part of the LLM-pipeline extension (no reference analog): tokenizer
training is the canonical "big corpus in, small artifact out" job.

Scale design (the 100 TB story):
- the corpus collapses to a (word, freq) table in ONE aggregation —
  all later passes run over the word table (vocabulary-sized, zipf-
  bounded), never the corpus again;
- each merge iteration is a pair-count aggregation (explode adjacent
  symbol pairs weighted by word freq, one shuffle on tiny keys) plus a
  single-row argmax collect — the driver holds only the merge list,
  exactly like PageRank's convergence scalar;
- the merge rewrite is a pure-Column left fold (F.aggregate) over the
  symbol array — JVM-side, no Python in the per-word path;
- ``bpe_encode`` applies a trained merge list to new text in one
  Arrow-batched pandas pass (the merge list broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kineo_spark.pipeline.text import tokens

END = "▁"  # end-of-word sentinel appended to the last character


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased corpus — the only corpus-wide
    pass BPE training makes."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Split a word into single-character symbols, end sentinel glued to
    the final character ("low" -> [l, o, w▁])."""
    chars = F.filter(F.split(word, ""), lambda c: F.length(c) > 0)
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit(END))).otherwise(c),
    )


def _merge_symbols(syms: Column, a: str, b: str) -> Column:
    """Left-to-right single-pass merge of adjacent (a, b) -> a+b inside
    a symbol array, as a pure-Column fold (no UDF)."""
    merged = a + b
    step = lambda acc, x: (  # noqa: E731
        F.when(
            acc["pend"].isNotNull() & (acc["pend"] == a) & (x == b),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["pend"].isNotNull(),
                       F.concat(acc["out"], F.array(acc["pend"])))
                .otherwise(acc["out"]).alias("out"),
                x.alias("pend"),
            )
        )
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
    ).otherwise(acc["out"])
    return F.aggregate(syms, init, step, fin)


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in training order. Ties on pair frequency break by pair
    lexicographic order for determinism."""
    words = word_table(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    # the word table is re-scanned every iteration — keep it hot
    words = words.persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = words.filter(F.size("syms") >= 2).select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.col("syms")[i].alias("a"),
                            F.col("syms")[i + 1].alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            top = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] <= 0:
                break
            a, b = top[0]["p"]["a"], top[0]["p"]["b"]
            merges.append((a, b))
            new = words.select(
                _merge_symbols(F.col("syms"), a, b).alias("syms"), "freq"
            ).persist()
            new.count()  # materialize before dropping the parent
            words.unpersist()
            words = new
    finally:
        words.unpersist()
    return merges


def bpe_vocab(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> DataFrame:
    """Train merges, then return the resulting symbol vocabulary with
    corpus frequencies: (symbol, freq)."""
    merges = bpe_train(df, text_col, n_merges)
    words = word_table(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    for a, b in merges:
        words = words.select(
            _merge_symbols(F.col("syms"), a, b).alias("syms"), "freq"
        )
    return (
        words.select(F.explode("syms").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Tokenize text with a trained merge list — one Arrow-batched
    pandas pass (the N-merge rewrite would otherwise need N chained
    Column folds; this is the legitimate batch-Python path)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    # postponed evaluation (PEP 563) stringifies hints module-wide, which
    # pandas_udf's type inference rejects — attach real objects instead
    def encode(texts):
        def enc_word(w: str) -> list[str]:
            syms = list(w)
            if not syms:
                return []
            syms[-1] = syms[-1] + END
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
            return syms

        return texts.map(
            lambda t: [s for w in (t or "").lower().split() for s in enc_word(w)]
        )

    encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    encode_udf = F.pandas_udf(ArrayType(StringType()))(encode)
    return df.withColumn(out_col, encode_udf(F.col(text_col)))
