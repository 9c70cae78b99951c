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


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3,
             with_size: bool = False) -> DataFrame:
    """(id, gram) distinct pairs — optionally with the document's
    distinct-shingle count riding along as ``sz``. Tokens materialize
    as a column before n-gram indexing (see text.ngrams_of: the inline
    form re-splits the text per element access).

    r12 (guide §2.4 remove shuffles outright): per-document
    ``array_distinct`` BEFORE the explode replaces the corpus-wide
    ``.distinct()`` — (id, gram) duplicates only ever exist within one
    document's row, so array-side dedup is equivalent and removes a
    full shuffle of the gram table; ``sz`` then falls out as an array
    length instead of a second aggregation pass over the table."""
    from kineo_spark.pipeline.text import ngrams_of, tokens
    from kineo_spark.scale import spread_small_scan

    toks = spread_small_scan(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    ).select("id", tokens(F.col("__t")).alias("__w"))
    grams = toks.select(
        "id", F.array_distinct(ngrams_of(F.col("__w"), n)).alias("__gs"))
    cols = ["id"] + ([F.size("__gs").alias("sz")] if with_size else [])
    return grams.select(*cols, F.explode("__gs").alias("gram"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold via inverted-index
    self-join. Returns (id_a, id_b, jaccard) with id_a < id_b.

    r12 shuffle-bytes diet (guide §2.3/§2.4): sizes ride the exploded
    rows (array-length projection, no per-doc aggregation pass), and a
    SIZE-COMPATIBILITY prune runs before the pair aggregation —
    J(A,B) = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|), so a pair whose
    size ratio is below the threshold can never verify; pruning it
    before the groupBy shrinks the pair shuffle. The prune uses a
    1e-9 slack so float rounding can never drop a pair whose exact
    ratio equals the threshold (the final exact filter is unchanged
    and authoritative)."""
    # shingles feed the join twice: materialize once
    sh = shingles(df, id_col, text_col, n, with_size=True).cache()
    if max_gram_freq is not None:
        hot = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("f")).filter(F.col("f") > max_gram_freq)
        sh = sh.join(F.broadcast(hot), "gram", "left_anti")
    a = sh.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "gram")
    b = sh.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.least("sz_a", "sz_b")
                >= (threshold - 1e-9) * F.greatest("sz_a", "sz_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_bag(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, gram) WITH duplicates — no extra shuffle of derived rows
    (the explode stays in the input row's partition; spread_small_scan
    only round-robins the narrow (id, text) input when the scan has
    fewer partitions than cores, so the per-gram hashing downstream
    isn't serialized on one core — guide §2.5). The right feed for
    MinHash: min() is duplicate-insensitive, so signatures never need
    the distinct."""
    from kineo_spark.pipeline.text import ngrams_of, tokens
    from kineo_spark.scale import spread_small_scan

    toks = spread_small_scan(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    ).select("id", tokens(F.col("__t")).alias("__w"))
    return toks.select("id", F.explode(ngrams_of(F.col("__w"), n)).alias("gram"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 64, n: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash signature per document in ONE aggregation:
    sig[i] = min over shingles of xxhash64(gram, i). Returns (id, sig).

    Feeds on the duplicate-preserving shingle bag by default: min() over
    a bag equals min() over the set, and skipping the distinct removes a
    corpus-sized (id, gram) shuffle — partial aggregation then reduces
    each doc to one 64-long row BEFORE the exchange (each doc's grams
    live in its input partition), so the signature shuffle is
    O(docs·k·8B) regardless of corpus size.

    (Measured non-win, for the record: Carter-Wegman linear permutations
    over two base hashes — the datasketch trick — benchmarked no faster
    than k seeded xxhash64 calls here; JVM xxhash64 on short grams is
    cheap and the whole-stage-codegen'd hash loop beats the extra
    projection. Kept the simpler, wider-hash-space scheme.)"""
    if sh is None:
        sh = shingle_bag(df, id_col, text_col, n)
    # r12: ONE sql-parsed aggregate expression instead of k Column
    # objects + a k-wide array projection — same plan, but built in a
    # single py4j round trip (plan construction was a measured ~1/3 of
    # this operator's wall; each Column op is a driver round trip)
    sig = F.expr(
        "array(" + ",".join(
            f"min(xxhash64(gram, {i}))" for i in range(k)) + ")"
    ).alias("sig")
    return sh.groupBy("id").agg(sig)


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows: int = 4
) -> DataFrame:
    """LSH banding: group signatures by (band index, hash of the band
    slice) and expand each bucket's id list into ordered pairs map-side.
    Returns distinct candidate pairs (id_a, id_b).

    r12 (guide §2.4): the bucket groupBy shuffles the banded table ONCE
    (partial-aggregated id lists); the previous a⋈b self-join exchanged
    the same table twice and sort-merged it. Pair expansion inside a
    bucket is the identical m·(m−1)/2 work either way; buckets are
    collision groups (near-dup families), bounded by the same argument
    that makes LSH usable at all."""
    # r12: one sql-parsed expression for the whole band array (single
    # py4j round trip; the per-Column form was ~200 driver round trips)
    band_structs = ",".join(
        "struct({b} as band, xxhash64(concat_ws(',', {slots})) as bh)".format(
            b=b, slots=",".join(
                f"cast(sig[{b * rows + r}] as string)" for r in range(rows)))
        for b in range(bands)
    )
    banded = sigs.select(
        "id", F.explode(F.expr(f"array({band_structs})")).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # ordered pairs of a sorted list: (ids[i], ids[j]) for i < j — the
    # same id_a < id_b set the self-join produced, generated without an
    # exchange (transform/slice are whole-stage-codegen'd array exprs)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x as id_a, y as id_b))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
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
    # Shuffle discipline (the 100 TB shape, re-measured r4):
    # 1. signatures aggregate the DUPLICATE-PRESERVING shingle bag —
    #    no distinct, and partial agg reduces each doc to one 64-long
    #    row before the exchange, so the signature shuffle is
    #    O(docs), not O(corpus grams);
    # 2. the verify stage sees only CANDIDATE docs' shingles (semi-join
    #    on the LSH candidate ids, then distinct on that small slice) —
    #    without both, this function shuffled the full (id, gram) table
    #    twice (2×62 MB at sf0.1 for ~300 pairs; now ~2 MB total).
    # Candidate doc-ids ≈ docs with near-dups — orders of magnitude
    # smaller than the corpus at any scale, so the semi-join's build
    # side broadcasts.
    bag = shingle_bag(df, id_col, text_col, n)
    sigs = minhash_signatures(df, id_col, text_col, k, n, sh=bag)
    cands = minhash_lsh_candidates(sigs, bands, rows)
    cand_docs = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # r12 (guide §2.4): each candidate doc's distinct grams collect into
    # ONE set-array row (collect_set dedups in the aggregation buffer),
    # and the pair join computes |A∩B| with array_intersect map-side —
    # replacing dropDuplicates + a sizes aggregation + a gram-level
    # two-sided join + a pair groupBy (5 exchanges over the candidate
    # slice) with one aggregation + two pair-level joins that AQE turns
    # into broadcasts when the slice is small and leaves as shuffles at
    # scale. Candidate docs ≈ docs with near-dups — the slice this runs
    # on is orders of magnitude smaller than the corpus at any scale.
    garr = (
        bag.join(F.broadcast(cand_docs), "id", "leftsemi")
        .groupBy("id").agg(F.collect_set("gram").alias("gs"))
    )
    ga = garr.select(F.col("id").alias("id_a"), F.col("gs").alias("gs_a"))
    gb = garr.select(F.col("id").alias("id_b"), F.col("gs").alias("gs_b"))
    return (
        cands.join(ga, "id_a").join(gb, "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("gs_a", "gs_b")).alias("inter"),
            F.size("gs_a").alias("sz_a"), F.size("gs_b").alias("sz_b"),
        )
        .filter(F.col("inter") > 0)
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


def gram_occurrences(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Positioned k-gram occurrences: (doc_id, pos, gh) with 1-based
    token position and an 8-byte xxhash64 gram key.

    The hash (not the gram string) is the join/shuffle key — at corpus
    scale the shuffle moves 16-byte rows instead of ~60-byte shingle
    strings. Collisions over 2^64 are negligible next to the exact
    verify the caller does on span extents.
    """
    from kineo_spark.pipeline.text import tokens

    from kineo_spark.scale import spread_small_scan

    toks = spread_small_scan(df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    )).select(
        "doc_id", tokens(F.col("__t")).alias("w")
    ).filter(F.size("w") >= k)
    idx = F.sequence(F.lit(1), F.size("w") - (k - 1))
    gram = F.transform(idx, lambda i: F.array_join(F.slice("w", i, k), " "))
    return toks.select(
        "doc_id", F.posexplode(gram).alias("off", "gram")
    ).select(
        "doc_id", (F.col("off") + 1).alias("pos"), F.xxhash64("gram").alias("gh")
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_tokens: int = 15,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """ExactSubstr-style span dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal
    token span of >= min_tokens words shared verbatim by two documents.

    Reference analog: none (the reference is a SPARQL engine); this is
    part of the LLM-pipeline extension mandated alongside SURVEY §2.

    Plan shape (the 100 TB story):
    1. one linear pass explodes positioned k-grams, keyed by xxhash64
       (``gram_occurrences``) — no driver state, ~16 B shuffle rows;
    2. candidate generation is a self **equi-join on the gram hash**
       (the suffix-array of the paper re-expressed relationally); the
       optional ``max_gram_freq`` cap drops stop-grams whose freq²
       join blowup would dominate, same knob as ``ngram_jaccard_pairs``;
    3. matching occurrences merge into maximal spans with zero extra
       joins: matches on one alignment share a diagonal
       (pos_a - pos_b); consecutive runs on a diagonal collapse via the
       classic gaps-and-islands window (pos_a - row_number()).

    Returns (id_a, id_b, start_a, start_b, span_tokens), 1-based starts.
    """
    from pyspark.sql import Window

    grams = gram_occurrences(df, id_col, text_col, k)
    if max_gram_freq is not None:
        hot = (
            grams.groupBy("gh").count()
            .filter(F.col("count") > max_gram_freq).select("gh")
        )
        grams = grams.join(F.broadcast(hot), "gh", "left_anti")
    a = grams.alias("a")
    b = grams.alias("b")
    m = (
        a.join(b, F.col("a.gh") == F.col("b.gh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
        .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    isl = m.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    return (
        isl.groupBy("id_a", "id_b", "diag", "isl")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .select(
            "id_a", "id_b",
            F.col("start_a").cast("long").alias("start_a"),
            F.col("start_b").cast("long").alias("start_b"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        )
    )


def cross_substring_spans(
    corpus: DataFrame,
    probes: DataFrame,
    corpus_id: str,
    probe_id: str,
    text_col: str = "text",
    k: int = 8,
    min_tokens: int = 15,
) -> DataFrame:
    """Cross-table ExactSubstr: maximal >= min_tokens token spans shared
    verbatim between a corpus document and a benchmark/probe document —
    token-level decontamination that, unlike the substring scan
    (``text.contamination``), still fires when the probe is embedded
    with different surrounding whitespace/casing context or only
    partially quoted.

    Same plan shape as ``exact_substring_spans`` (hash-keyed k-gram
    equi-join + gaps-and-islands merge), but the join is corpus×probes,
    so its cost is bounded by the (small) probe side's gram postings.
    Returns (corpus_id, probe_id, start_corpus, start_probe,
    span_tokens), 1-based token starts.
    """
    from pyspark.sql import Window

    ga = gram_occurrences(corpus, corpus_id, text_col, k)
    gb = gram_occurrences(probes, probe_id, text_col, k)
    m = (
        ga.alias("a")
        .join(gb.alias("b"), F.col("a.gh") == F.col("b.gh"))
        .select(
            F.col("a.doc_id").alias("cid"),
            F.col("b.doc_id").alias("pid"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
        .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    )
    w = Window.partitionBy("cid", "pid", "diag").orderBy("pos_a")
    isl = m.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    return (
        isl.groupBy("cid", "pid", "diag", "isl")
        .agg(
            F.min("pos_a").alias("start_corpus"),
            F.min("pos_b").alias("start_probe"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .select(
            F.col("cid").alias("corpus_id"),
            F.col("pid").alias("probe_id"),
            F.col("start_corpus").cast("long").alias("start_corpus"),
            F.col("start_probe").cast("long").alias("start_probe"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): slide a window of ``w`` consecutive k-gram hashes and
    select each window's minimum (rightmost occurrence on ties). The
    selected (pos, hash) set is a provably robust sketch: any match of
    length >= w + k - 1 tokens is guaranteed to share a fingerprint,
    while the sketch is ~2/(w+1) the size of the full gram stream.

    Plan shape (r12, guide §2.4 remove shuffles outright): winnowing is
    a PER-DOCUMENT computation, so the whole selection — k-gram
    hashing, the w-wide sliding min with rightmost tie-break, and the
    fingerprint dedup — runs as whole-stage-codegen'd array expressions
    on each document's row: ZERO exchanges (previously the full gram
    stream shuffled into a per-doc window — the operator's dominant
    shuffle, 33 MB at sf0.1). Only the selected sketch (density
    ~2/(w+1)) is exploded. Documents are assumed unique per ``id_col``
    (the same per-doc-row assumption every operator in this module
    makes); the per-doc ``array_distinct`` is then exactly the old
    global distinct. At corpus scale the sketch — not the text — feeds
    the dedup join, cutting candidate generation I/O by the winnowing
    density factor.

    Returns (doc_id, pos, gh) distinct selected fingerprints; pos is
    the 1-based token position of the selected gram, gh its md5 hex.
    """
    from kineo_spark.pipeline.text import tokens
    from kineo_spark.scale import spread_small_scan

    # md5-hex gram keys (not xxhash64): the winnowing SELECTION depends
    # on hash ordering, so an engine-portable hash keeps the sketch —
    # and therefore the oracle — deterministic across engines. Swap in
    # xxhash64 at corpus scale if the sketch never leaves Spark.
    # A doc yields fingerprints only when it has >= w full windows'
    # worth of grams: size(w) - k + 1 >= w (the old "full windows only"
    # filter); spread_small_scan because with no exchange left, the
    # per-doc compute otherwise inherits a one-row-group scan's single
    # partition (guide §2.5).
    toks = spread_small_scan(df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    )).select(
        "doc_id", tokens(F.col("__t")).alias("w")
    ).filter(F.size("w") >= k + w - 1)
    idx = F.sequence(F.lit(1), F.size("w") - (k - 1))
    gh_arr = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice("w", i, k), " ")))
    g = toks.select("doc_id", gh_arr.alias("gh"))
    # window starts 1..G-w+1; each picks min (gh, -pos) over its w grams
    # — lexicographic struct min = smallest hash, rightmost position
    picks = F.transform(
        F.sequence(F.lit(1), F.size("gh") - (w - 1)),
        lambda i: F.array_min(F.transform(
            F.sequence(i, i + (w - 1)),
            lambda j: F.struct(
                F.element_at("gh", j).alias("gh"), (-j).alias("np")),
        )),
    )
    return (
        g.select("doc_id", F.explode(F.array_distinct(picks)).alias("p"))
        .select(
            "doc_id",
            (-F.col("p.np")).cast("long").alias("pos"),
            F.col("p.gh").alias("gh"),
        )
    )


def _parse_spark_size(v: str) -> int:
    """Parse a Spark size conf value ('10485760', '10MB', '-1') to
    bytes. Bare numbers are bytes (autoBroadcastJoinThreshold's
    documented unit)."""
    s = str(v).strip().lower()
    for suf, m in (("tb", 1024 ** 4), ("gb", 1024 ** 3), ("mb", 1024 ** 2),
                   ("kb", 1024), ("t", 1024 ** 4), ("g", 1024 ** 3),
                   ("m", 1024 ** 2), ("k", 1024), ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * m)
    return int(float(s))


# conservative in-memory bytes per seen-side fingerprint row inside a
# BroadcastHashJoin relation (32-char md5 string + UnsafeRow + hash-map
# entry overhead); used only by the Bloom gate below, so an over-
# estimate merely keeps the Bloom on a little longer than strictly
# needed — never changes results
_FP_BROADCAST_ROW_BYTES = 96


def _anti_join_broadcasts(spark, n_seen: int) -> bool:
    """True when the plain fingerprint anti-join against ``n_seen``
    archive rows would already run as a broadcast hash join — the
    regime where a Bloom pre-filter is pure fixed cost (the r8 bench
    showed the unconditional Bloom build costing 2.6x wall at sf0.1
    where the 250-row seen side broadcasts). Mirrors the dangling-set
    broadcast gate in graph.py: compare the estimated build-side bytes
    to spark.sql.autoBroadcastJoinThreshold; a disabled threshold (-1,
    the archive-scale regime the bench probe simulates) always keeps
    the Bloom."""
    try:
        thr = _parse_spark_size(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        thr = 10 * 1024 * 1024
    return thr > 0 and n_seen * _FP_BROADCAST_ROW_BYTES <= thr


def _bloom_words(fps: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Distributed Bloom build: k xxhash64 positions per fingerprint,
    packed into 64-bit words with a bit_or aggregation. The result is a
    (word_idx, word) table of ≤ m_bits/64 rows — the broadcastable
    representation of the filter (~19 MB of words per billion keys at
    10 bits/key)."""
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col("fp"), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ])).alias("pos")
    return (
        fps.select(pos)
        .select(F.expr("pos div 64").alias("word_idx"),
                F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("m"))
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("word"))
    )


def _bloom_probe(df: DataFrame, words: DataFrame, m_bits: int,
                 k: int) -> tuple[DataFrame, "F.Column"]:
    """Map-side membership test: k chained BROADCAST left joins against
    the word table (a broadcast hash join never shuffles the probe
    side), then a bit test per hash. Returns (df_with_join_cols,
    candidate_condition): condition FALSE ⇒ definitely not in the
    built set."""
    conds = []
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col("fp"), F.lit(i)), F.lit(m_bits))
        df = df.withColumn(f"__bwi{i}", F.expr(
            f"pmod(xxhash64(fp, {i}), {m_bits}) div 64"))
        df = df.withColumn(f"__bm{i}", F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64(fp, {i}), {m_bits}) % 64 "
            "AS INT))"))
        df = df.join(
            F.broadcast(words.select(
                F.col("word_idx").alias(f"__bwi{i}"),
                F.col("word").alias(f"__bw{i}"))),
            f"__bwi{i}", "left")
        conds.append(F.col(f"__bw{i}").isNotNull()
                     & (F.col(f"__bw{i}").bitwiseAND(F.col(f"__bm{i}")) != 0))
    cand = conds[0]
    for c in conds[1:]:
        cand = cand & c
    return df, cand


def dedup_against_corpus(
    new: DataFrame,
    seen: DataFrame,
    id_col: str,
    text_col: str = "text",
    bloom: bool = False,
    expected_items: int | None = None,
    bits_per_key: int = 14,
    bloom_k: int = 3,
) -> DataFrame:
    """Incremental exact dedup: drop rows of ``new`` whose normalized
    fingerprint already exists in the ingested corpus ``seen`` (the
    daily-crawl-vs-archive pattern). Expressed as an anti-join on the
    fingerprint, so the semantics are exact.

    100 TB shape: the join shuffles only fingerprints (16-byte md5
    keys), never text; with a persisted corpus the fingerprint column
    is a parquet column read straight off disk. With ``bloom=True`` a
    broadcast Bloom filter of the seen-side fingerprints (built
    distributed: k xxhash64 bit positions bit_or-packed into 64-bit
    words) splits the new batch MAP-SIDE: Bloom-negative rows (~99% of
    a typical daily crawl at ~0.7% false-positive rate with 14
    bits/key, k=3) bypass the anti-join entirely — only Bloom-positive
    candidates pay the shuffle. The anti-join stays for exactness
    (Bloom alone would also drop false positives), so the result is
    identical with and without the pre-filter, by construction.

    ``expected_items`` sizes the filter; when omitted, one count() job
    on the seen side (a metadata-cheap scan of the fingerprint column)
    determines it.

    ``bloom=True`` is ADAPTIVE (r9): when the seen side is small enough
    that the plain anti-join already broadcasts
    (n_seen × ~96 B ≤ spark.sql.autoBroadcastJoinThreshold), the Bloom
    build is skipped — at that scale it is pure fixed cost (measured
    2.6× wall at sf0.1 in BENCH_r08). With the threshold disabled (-1,
    the archive regime), the Bloom always runs.

    Returns the surviving (id, fp) rows of the new batch.
    """
    nf = new.select(F.col(id_col).alias("id"),
                    fingerprint(F.col(text_col)).alias("fp"))
    sf = seen.select(fingerprint(F.col(text_col)).alias("fp"))
    if not bloom:
        return nf.join(sf, "fp", "left_anti")
    n_seen = expected_items if expected_items is not None else sf.count()
    if _anti_join_broadcasts(new.sparkSession, n_seen):
        # r9 adaptive gate: the seen side fits a broadcast hash
        # anti-join, so the Bloom build/probe would be pure overhead —
        # same result by construction (the Bloom never changes
        # semantics, only routes rows around the shuffle)
        return nf.join(sf, "fp", "left_anti")
    m_bits = max(1024, n_seen * bits_per_key)
    words = _bloom_words(sf, m_bits, bloom_k)
    probed, cand = _bloom_probe(nf, words, m_bits, bloom_k)
    negatives = probed.filter(~cand).select("id", "fp")
    candidates = probed.filter(cand).select("id", "fp")
    survivors = candidates.join(sf, "fp", "left_anti")
    return negatives.unionByName(survivors)


def write_corpus_fingerprints(
    seen: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
    path: str | None = None,
    bloom: bool = True,
    bits_per_key: int = 14,
    bloom_k: int = 3,
) -> None:
    """Persist the ingested corpus's fingerprints as a BUCKETED+SORTED
    table (bucketBy fp) — the archive-side half of the 100 TB
    incremental-dedup design: the daily anti-join then reads the
    archive pre-partitioned on the join key, so the archive side of the
    residual check is ZERO-Exchange (same persisted-layout pattern as
    the dictionary ID layout, dictionary.py write_id_layout). Combined
    with the broadcast Bloom pre-filter, total shuffle per daily batch
    ≈ the Bloom-positive candidate slice only.

    ``bloom=True`` (r9) additionally persists the Bloom WORD TABLE as
    ``{name}_bloom`` (word_idx, word, m_bits, k): the filter build is
    O(archive) — measured 14.5 MB of position shuffle per call at a
    500k-row archive — so it is paid ONCE at ingest, not per daily
    batch. dedup_against_corpus_indexed then probes the persisted words
    (a kilobytes-to-megabytes broadcast) with zero per-batch build."""
    spark = seen.sparkSession
    sf = seen.select(F.col(id_col).alias("id"),
                     fingerprint(F.col(text_col)).alias("fp"))
    w = (sf.repartition(buckets, "fp")
         .write.format("parquet").mode("overwrite")
         .bucketBy(buckets, "fp").sortBy("fp"))
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    if bloom:
        import uuid

        # Pairing token (r9 ADVICE): the bloom is only sound for the
        # EXACT archive it was built from — a stale filter silently
        # passes duplicates (false negatives bypass the residual
        # anti-join). The token lives in the word table AND as a
        # TBLPROPERTY on the fingerprint table; any out-of-band
        # overwrite of the fingerprints (saveAsTable recreates the
        # table, clearing properties) breaks the pair and the reader
        # falls back to an on-the-fly build. Metadata-only — no
        # per-batch count job.
        token = uuid.uuid4().hex
        n_seen = spark.table(name).count()
        m_bits = max(1024, n_seen * bits_per_key)
        words = _bloom_words(spark.table(name).select("fp"),
                             m_bits, bloom_k)
        bw = (words.withColumn("m_bits", F.lit(m_bits))
                   .withColumn("k", F.lit(bloom_k))
                   .withColumn("pair_id", F.lit(token))
                   .write.format("parquet").mode("overwrite"))
        if path:
            bw = bw.option("path", path + "_bloom")
        bw.saveAsTable(f"{name}_bloom")
        spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES "
                  f"('kineo.bloom_pair'='{token}')")
    else:
        # bloom=False must not leave a previously persisted word table
        # behind: it would describe the OLD archive (r9 ADVICE finding)
        spark.sql(f"DROP TABLE IF EXISTS {name}_bloom")


def _bloom_paired(spark, name: str) -> bool:
    """True iff the persisted ``{name}_bloom`` word table was built from
    the CURRENT ``{name}`` fingerprint table: the write stamps one token
    in both (a pair_id column there, a TBLPROPERTY here — named to dodge SHOW TBLPROPERTIES'  "token" redaction). Unpaired — property
    cleared by an out-of-band overwrite, or a pre-token table — means
    the filter may produce false negatives, so the caller must not
    trust it. Metadata-only check (no job)."""
    bt = spark.table(f"{name}_bloom")
    if "pair_id" not in bt.columns:
        return False
    try:
        props = {r["key"]: r["value"]
                 for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()}
    except Exception:
        return False
    want = props.get("kineo.bloom_pair")
    if not want:
        return False
    have = bt.select("pair_id").first()
    return have is not None and have["pair_id"] == want


def dedup_against_corpus_indexed(
    new: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom: bool = True,
    expected_items: int | None = None,
) -> DataFrame:
    """Incremental exact dedup against a PERSISTED bucketed fingerprint
    index (write_corpus_fingerprints). Identical results to
    dedup_against_corpus; the plan differs: the archive side scans its
    buckets with no Exchange, and (with bloom) the daily side shuffles
    only the Bloom-positive candidates.

    r9: when the index was written with its Bloom word table
    (``{name}_bloom``), the probe reads the PERSISTED words — per-batch
    cost is the word-table broadcast plus the candidate anti-join; the
    O(archive) filter build was paid once at ingest. Without the
    companion table, the filter is built on the fly (the pre-r9
    behavior), still gated by the broadcast-anti-join check."""
    spark = new.sparkSession
    sf = spark.table(name).select("fp")
    nf = new.select(F.col(id_col).alias("id"),
                    fingerprint(F.col(text_col)).alias("fp"))
    if not bloom:
        return nf.join(sf, "fp", "left_anti")
    if spark.catalog.tableExists(f"{name}_bloom") and _bloom_paired(
            spark, name):
        bt = spark.table(f"{name}_bloom")
        meta = bt.select("m_bits", "k").first()
        probed, cand = _bloom_probe(
            nf, bt.select("word_idx", "word"), meta["m_bits"], meta["k"])
    else:
        n_seen = expected_items if expected_items is not None else sf.count()
        if _anti_join_broadcasts(spark, n_seen):
            return nf.join(sf, "fp", "left_anti")  # r9 gate — see above
        m_bits = max(1024, n_seen * 14)
        probed, cand = _bloom_probe(nf, _bloom_words(sf, m_bits, 3),
                                    m_bits, 3)
    negatives = probed.filter(~cand).select("id", "fp")
    candidates = probed.filter(cand).select("id", "fp")
    return negatives.unionByName(candidates.join(sf, "fp", "left_anti"))


def _deletion_variants(s, k: int):
    """Column of all strings reachable from ``s`` by deleting up to
    ``k`` characters (the FastSS neighborhood, k ∈ {1, 2}). Built as a
    nested higher-order transform so the whole expansion stays in
    whole-stage codegen — no UDF."""
    if k not in (1, 2):
        raise ValueError("fuzzy_pairs supports max_dist 1 or 2")
    one = (
        "transform(sequence(1, length({s})), "
        "i -> concat(substring({s}, 1, i - 1), substring({s}, i + 1)))"
    )
    d1 = one.format(s=s)
    parts = [f"array({s})", d1]
    if k == 2:
        # delete one char from every 1-deletion variant
        parts.append(
            f"flatten(transform({d1}, v -> "
            + one.format(s="v") + "))"
        )
    return F.array_distinct(F.expr("concat(" + ", ".join(parts) + ")"))


def fuzzy_pairs(
    df: DataFrame, id_col: str, text_col: str, max_dist: int = 1,
    cap: int = 64, observation=None,
) -> DataFrame:
    """Edit-distance self-join (fuzzy dedup of names/titles/URLs):
    returns (id_a, id_b, dist) for all pairs with
    levenshtein ≤ ``max_dist``, id_a < id_b.

    Candidate generation is the FastSS deletion neighborhood: if
    ed(a, b) ≤ k then deleting the chars an optimal alignment
    substitutes/inserts/deletes (≤ k on each side) leaves equal
    strings, so a and b share a ≤k-deletion variant. Candidates =
    pairs sharing a variant key; the exact JVM ``levenshtein`` then
    verifies. Superset-then-verify, like every blocker in this module.

    100 TB shape: the variant index is O(rows · len^k) keys of
    ~len bytes — one explode, one equi-join on the variant hash, no
    all-pairs anywhere. ``cap`` bounds any hot variant key (mirrors
    the hot-shingle cap in ngram_jaccard_pairs): a key shared by c
    strings yields c² candidates, and a cap turns adversarial
    mass-duplicate clusters into bounded work; capped keys can only
    lose candidate pairs that other (uncapped) shared variants almost
    always still generate — exact-dup flooding belongs to exact dedup,
    not the fuzzy pass.

    Recall loss from the cap is OBSERVABLE: pass a
    ``pyspark.sql.Observation`` and after the first action it carries
    ``truncated_variant_buckets`` (hot variant keys that hit the cap)
    and ``dropped_variant_rows`` (id×variant rows discarded) — both 0
    on cap-free inputs. Callers seeing non-zero buckets should route
    exact duplicates through exact_dedup first (they dominate hot
    variants) or raise ``cap``.
    """
    from pyspark.sql import Window

    from kineo_spark.scale import spread_small_scan

    # narrow (id, text) input spread before the O(len^k) variant explode
    # and hashing — a one-row-group scan otherwise runs them on one core
    # until the cap window's exchange (guide §2.5 unsplittable input)
    base = spread_small_scan(df.select(F.col(id_col).alias("id"),
                                       F.col(text_col).alias("__t")))
    var = base.select(
        "id", "__t",
        F.explode(_deletion_variants("__t", max_dist)).alias("__v"),
    ).select("id", "__t", F.xxhash64("__v").alias("__vh"))
    numbered = var.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__vh").orderBy(F.col("id"))),
    )
    if observation is not None:
        # exactly one row per over-cap bucket carries __rn == cap + 1
        numbered = numbered.observe(
            observation,
            F.count(F.when(F.col("__rn") == cap + 1, 1)).alias(
                "truncated_variant_buckets"),
            F.count(F.when(F.col("__rn") > cap, 1)).alias(
                "dropped_variant_rows"))
    capped = numbered.filter(F.col("__rn") <= cap).drop("__rn")
    a = capped.select(F.col("id").alias("id_a"), F.col("__t").alias("__ta"),
                      "__vh")
    b = capped.select(F.col("id").alias("id_b"), F.col("__t").alias("__tb"),
                      "__vh")
    # r12 (guide §2.3 shuffle fewer bytes): verify with levenshtein and
    # filter BEFORE deduplicating, so the dedup exchange moves narrow
    # (id_a, id_b, dist) rows of surviving pairs instead of candidate
    # pairs carrying both text payloads. A pair sharing several variant
    # keys re-verifies once per key — JVM levenshtein on short strings
    # is far cheaper than shuffling the texts (measured 10.5 → ~4 MB
    # steady-state shuffle, identical output).
    # bounded levenshtein (threshold form, banded O(len·k) DP instead of
    # the full O(len²) matrix — guide §1.2 per-task work): returns -1
    # past the bound, and the exact distance ≤ max_dist otherwise, so
    # surviving rows carry the identical dist value
    return (
        a.join(b, "__vh")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("__ta", "__tb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
        .distinct()
    )
