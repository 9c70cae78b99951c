"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the 100 TB story):
- exact dedup is a hash groupBy — one shuffle on a 128-bit key.
- n-gram Jaccard pairs use an inverted-index join (explode shingles,
  self-join on shingle, count): cost is Σ freq(gram)², so hot shingles
  are capped (``max_gram_freq``) exactly like search engines drop
  stop-shingles. This is the verify step; at corpus scale you run it
  only on MinHash-LSH candidates.
- MinHash signatures are k seeded xxhash64 mins computed in one
  aggregation pass (no per-permutation jobs); LSH banding turns
  candidate generation into an equi-join on (band, band-hash) — the
  shuffle key is small and uniformly distributed.
- SimHash packs a 60-bit signature from md5 token hashes via per-bit
  majority vote, all in one aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kineo_spark.pipeline.text import fingerprint, word_ngrams

SIMHASH_BITS = 60  # md5-derived; 60 keeps the unsigned value inside int64


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Group identical (normalized) texts; keep the minimum id.
    Returns (fp, keep_id, n_dupes)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def prefix_key(text: Column, k: int = 5) -> Column:
    """First-k normalized words — a cheap blocking/cluster key for
    boilerplate and near-header duplicates (prefix dedup)."""
    return F.array_join(
        F.slice(F.split(F.lower(F.trim(text)), r"\s+"), 1, k), " ")


def dedup_clusters(
    df: DataFrame, id_col: str, text_col: str = "text",
    key: Column | None = None,
) -> DataFrame:
    """Duplicate CLUSTERS via connected components + canonical member.

    Pair generators (exact fingerprints here; MinHash/SimHash verified
    pairs in the approximate pipelines) emit edges; transitive grouping
    needs a connected-components pass — A~B and B~C must collapse into
    one cluster even when A~C was never emitted. Edges are built as
    in-group CHAINS (id → next id), so components genuinely propagate
    labels over multiple hops rather than reading them off a star.
    Returns (id, canon) for every clustered doc, canon = min id —
    singletons are absent (nothing to dedup).

    At 100 TB: edges are O(duplicates), the CC loop shuffles only
    (id, label) longs, and convergence is O(cluster diameter) —
    chains make that the worst case; real dup clusters are denser."""
    from kineo_spark.graph import connected_components_keyed
    from pyspark.sql import Window

    if key is None:
        key = fingerprint(F.col(text_col))  # exact-duplicate clusters
    h = df.select(F.col(id_col).alias("id"), key.alias("__fp"))
    w = Window.partitionBy("__fp").orderBy("id")
    chain = h.withColumn("__prev", F.lag("id").over(w)).filter(
        F.col("__prev").isNotNull())
    edges = chain.select(F.col("__prev").alias("src"), F.col("id").alias("dst"))
    cc = connected_components_keyed(edges)
    return cc.select(F.col("node").alias(id_col), F.col("component").alias("canon"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, gram) distinct pairs."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold via inverted-index
    self-join. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    # shingles feed the join twice plus the size table: materialize once
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_gram_freq is not None:
        hot = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("f")).filter(F.col("f") > max_gram_freq)
        sh = sh.join(F.broadcast(hot), "gram", "left_anti")
    a = sh.select(F.col("id").alias("id_a"), "gram")
    b = sh.select(F.col("id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 64, n: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash signature per document in ONE aggregation:
    sig[i] = min over shingles of xxhash64(gram, i). Returns (id, sig)."""
    if sh is None:
        sh = shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("gram"), F.lit(i))).alias(f"h{i}") for i in range(k)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows: int = 4
) -> DataFrame:
    """LSH banding: equi-join on (band index, hash of the band slice).
    Returns distinct candidate pairs (id_a, id_b)."""
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)])
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.select(F.col("id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard (the standard
    two-phase near-dup pipeline). Returns (id_a, id_b, jaccard)."""
    rows = k // bands
    sh = shingles(df, id_col, text_col, n).cache()
    sigs = minhash_signatures(df, id_col, text_col, k, n, sh=sh)
    cands = minhash_lsh_candidates(sigs, bands, rows)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "gram")
    b = sh.select(F.col("id").alias("id_b"), "gram")
    inter = (
        cands.join(a, "id_a").join(b, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document: per-bit majority vote over token md5
    hashes, packed into a long. Returns (id, simhash)."""
    from kineo_spark.pipeline.text import tokens

    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("id").agg(*votes)
    packed = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        packed = term if packed is None else (packed + term)
    return agg.select("id", packed.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_distance: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on signature
    prefixes (4 rotations) so the join is an equi-join, not a cross
    product. Returns (id_a, id_b, distance)."""
    sigs = simhash(df, id_col, text_col)
    blocks = sigs.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(rot).alias("rot"),
                    F.shiftright(F.col("simhash"), rot * prefix_bits)
                    .bitwiseAND(F.lit((1 << prefix_bits) - 1)).alias("blk"),
                )
                for rot in range(SIMHASH_BITS // prefix_bits + 1)
            ])
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.rot").alias("rot"), F.col("bb.blk").alias("blk"))
    a = blocks.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "rot", "blk")
    b = blocks.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "rot", "blk")
    return (
        a.join(b, ["rot", "blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("distance"))
        .distinct()
        .filter(F.col("distance") <= max_distance)
    )
