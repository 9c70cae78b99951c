"""Language content-negotiation over quads.

Reference: the language-aware stores filter (s, p, g) groups of
language-tagged literals down to the best language by Accept-Language
q-values (LanguageMemoryQuadStore, MemoryQuadStore.swift:284-448;
SQLite twin SQLiteQuadStore.swift:752-928).

Spark shape: a window rank over (s, p, g) partitions — one shuffle, no
driver loops (SURVEY §2.10 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def parse_accept_language(header: str) -> list[tuple[str, float]]:
    """'en;q=0.9, fr;q=0.5, *;q=0.1' → [(lang, q), ...]."""
    out = []
    for part in header.split(","):
        bits = part.strip().split(";")
        lang = bits[0].strip().lower()
        qv = 1.0
        for b in bits[1:]:
            b = b.strip()
            if b.startswith("q="):
                try:
                    qv = float(b[2:])
                except ValueError:
                    qv = 0.0
        if lang:
            out.append((lang, qv))
    return out


def best_language_quads(quads: DataFrame, accept_language: str) -> DataFrame:
    """Keep, per (s, p, g) group, only the language-tagged literal(s)
    with the highest q-value among acceptable languages (plus all
    non-language quads untouched)."""
    prefs = parse_accept_language(accept_language)
    q_expr = F.lit(0.0)
    star_q = next((q for l, q in prefs if l == "*"), 0.0)
    q_expr = F.lit(star_q)
    for lang, qv in sorted(prefs, key=lambda x: x[1]):
        if lang == "*":
            continue
        q_expr = F.when(F.lower(F.col("o_lang")) == lang, F.lit(qv)).otherwise(q_expr)

    lang_rows = quads.filter(F.col("o_lang").isNotNull()).withColumn("__q", q_expr)
    lang_rows = lang_rows.filter(F.col("__q") > 0)
    w = Window.partitionBy("s_kind", "s_lex", "p_lex", "g_lex")
    best = (
        lang_rows.withColumn("__maxq", F.max("__q").over(w))
        .filter(F.col("__q") == F.col("__maxq"))
        .drop("__q", "__maxq")
    )
    non_lang = quads.filter(F.col("o_lang").isNull())
    return non_lang.unionByName(best)
