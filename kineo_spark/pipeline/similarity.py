"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact top-k cosine; the query side is broadcast so
  the corpus is scanned once with no shuffle — the right baseline shape
  even at 100 TB (cost = one pass over the corpus per query batch).
- ``lsh_ann``: random-hyperplane (sign) LSH with deterministic
  Rademacher planes derived from xxhash64, bucketed equi-join — the
  scale path: candidate generation touches only same-bucket vectors.
- ``embedding_near_dup_pairs``: all-pairs cosine ≥ τ via LSH buckets.

All vector math is JVM-side (zip_with / aggregate over array columns) —
no Python in the scan loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding the
    query row itself). Returns (query_id, neighbor_id, sim), ties broken
    by neighbor id."""
    from kineo_spark.scale import spread_small_scan

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # r12: a one-row-group corpus scan otherwise serializes the whole
    # dot-product sweep (|corpus|×|queries| cosines) on one core —
    # guide §2.5; no-op when the scan is already at cluster parallelism
    c = spread_small_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def _rademacher(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 weights for one hyperplane, fixed at plan-build
    time on the driver (seeded PRNG per plane index)."""
    import random

    rng = random.Random(0xC0FFEE ^ (plane * 2654435761))
    return [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]


def _plane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Rademacher hyperplane bit: sign of sum_j w_j * vec[j]. The
    weights are LITERALS baked into the plan — the earlier form derived
    them per element with xxhash64 inside the aggregate lambda, which
    Catalyst re-evaluates per row per element (the lambda re-eval trap:
    128 planes x 64 hashes per row); with literal weights the runtime
    work is one fused multiply-add sweep."""
    w = F.array(*[F.lit(x) for x in _rademacher(plane, dim)])
    s = F.aggregate(
        F.zip_with(vec, w, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Pack n sign bits into a bucket id (long)."""
    out = None
    for p in range(n_planes):
        term = F.shiftleft(_plane_sign(vec, p, dim), p)
        out = term if out is None else (out + term)
    return out


def _table_buckets(vec: Column, n_tables: int, n_planes: int, dim: int) -> Column:
    """array<struct<t,b>>: this vector's bucket in each of the
    ``n_tables`` hyperplane tables — explodes to ONE (t, b) equi-join
    over all tables instead of n_tables separate self-joins (the
    minhash-band shape; one shuffle, one plan)."""
    return F.array(*[
        F.struct(
            F.lit(t).alias("t"),
            _bucket_off(vec, t * n_planes, n_planes, dim).alias("b"),
        )
        for t in range(n_tables)
    ])


def _all_table_buckets_udf(n_tables: int, n_planes: int, dim: int):
    """All n_tables bucket ids in ONE Arrow-batched matmul: rows×dim @
    dim×(tables·planes) sign matrix, bits packed per table. For large
    table counts the pure-Column form builds a 128-plane expression
    tree whose per-plane zip_with/aggregate dominates (measured: the
    32-table bucket computation was the whole runtime); one numpy
    matmul per Arrow batch replaces it. Weights are the same
    driver-fixed Rademacher planes (_rademacher)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.array(
        [_rademacher(t * n_planes + p, dim)
         for t in range(n_tables) for p in range(n_planes)]
    ).T  # (dim, tables*planes)
    mult = 1 << np.arange(n_planes)

    def _buckets(v):
        m = np.array(v.tolist(), dtype=np.float64)  # (rows, dim)
        signs = (m @ W) >= 0  # (rows, tables*planes)
        b = (signs.reshape(len(m), n_tables, n_planes) * mult).sum(axis=2)
        return pd.Series(list(b.astype("int64")))

    # no annotations: pd is function-local, and pyspark resolves
    # annotation strings against module globals
    return pandas_udf(_buckets, "array<long>")


def lsh_ann(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    k: int = 5, n_planes: int = 4, dim: int = 64, n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane-LSH
    tables evaluated as ONE exploded (table, bucket) equi-join,
    candidates deduped, exact cosine re-rank.
    Returns (query_id, neighbor_id, sim)."""
    bfun = _all_table_buckets_udf(n_tables, n_planes, dim)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        F.posexplode(bfun(F.col(vec_col))).alias("t", "b"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.posexplode(bfun(F.col(vec_col))).alias("t", "b"),
    )
    cands = (
        cb.join(F.broadcast(qb), ["t", "b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def _bucket_off(vec: Column, offset: int, n_planes: int, dim: int) -> Column:
    out = None
    for p in range(n_planes):
        term = F.shiftleft(_plane_sign(vec, offset + p, dim), p)
        out = term if out is None else (out + term)
    return out


def ivf_ann(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    k: int = 5, n_lists: int = 16, n_probe: int = 4, seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means partitions the corpus into
    ``n_lists`` cells; each query searches only its ``n_probe`` nearest
    cells. The 100 TB shape: centroids broadcast, the corpus is
    partitioned by cell once, and query cost is corpus/n_lists·n_probe.
    Returns (query_id, neighbor_id, sim)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_lists, seed=seed, maxIter=10).fit(c.select("features"))
    assigned = model.transform(c).select(
        "neighbor_id", "cvec", F.col("prediction").alias("cell")
    )
    centers = [list(map(float, x)) for x in model.clusterCenters()]
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centers)], "cell int, center array<double>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # nearest n_probe cells per query (centroid table is tiny → broadcast)
    qc = q.crossJoin(F.broadcast(centers_df)).select(
        "query_id", "qvec", "cell",
        cosine(F.col("qvec"), F.col("center")).alias("csim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell"))
    probes = qc.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n_probe)
    scored = (
        probes.select("query_id", "qvec", "cell")
        .join(assigned, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 8, dim: int = 64, n_tables: int = 8,
) -> DataFrame:
    """All-pairs cosine near-duplicates via LSH bucket join + exact
    verification — all ``n_tables`` tables in ONE exploded (table,
    bucket) equi-join (see _table_buckets). Returns (id_a, id_b, sim)."""
    bfun = _all_table_buckets_udf(n_tables, n_planes, dim)
    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.posexplode(bfun(F.col(vec_col))).alias("t", "bk"),
    )
    a = b.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), "t", "bk")
    c = b.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), "t", "bk")
    pairs = (
        a.join(c, ["t", "bk"]).filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def pq_train_codebooks(
    corpus: DataFrame, vec_col: str, m: int = 4, codebook_k: int = 16,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011): split
    the vector into ``m`` subvectors and k-means each subspace
    independently. Returns centers[j][c] = subspace-j centroid c."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    normed = corpus.select(_unit(F.col(vec_col)).alias("nv"))
    books = []
    for j in range(m):
        sub = normed.select(
            array_to_vector(F.slice(F.col("nv"), j * d + 1, d)).alias("features")
        )
        model = KMeans(k=codebook_k, seed=seed + j, maxIter=10).fit(sub)
        books.append([list(map(float, c)) for c in model.clusterCenters()])
    return books


def _unit(v: Column) -> Column:
    """L2-normalize (as double) — PQ quantizes UNIT vectors so that L2
    in code space is monotone with the cosine the caller ranks by."""
    n = _norm(v)
    return F.transform(v.cast("array<double>"), lambda x: x / n)


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def pq_encode(
    corpus: DataFrame, id_col: str, vec_col: str,
    books: list[list[list[float]]],
) -> DataFrame:
    """Encode each vector as m nearest-centroid codes — the corpus
    shrinks from m·d floats to m small ints per row (the whole point:
    the ANN scan then reads ~16x less data). Pure Column argmin per
    subspace, codebooks inlined as literals (they are tiny)."""
    m = len(books)
    d = len(books[0][0])
    cols = [F.col(id_col).alias("neighbor_id")]
    codes = []
    nv = _unit(F.col(vec_col))
    for j, centers in enumerate(books):
        sub = F.slice(nv, j * d + 1, d)
        dists = F.array(*[
            _sq_dist(sub, F.array(*[F.lit(x) for x in c])) for c in centers
        ])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
    cols.append(F.array(*codes).alias("codes"))
    return corpus.select(*cols)


def pq_ann(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    k: int = 5, m: int = 4, codebook_k: int = 16, seed: int = 42,
    rerank: int = 4,
) -> DataFrame:
    """Product-quantization ANN: codebooks broadcast, corpus stored as
    m-byte codes, each query scores docs via a per-query lookup table
    (asymmetric distance computation) — one compressed corpus scan per
    query batch, then an exact cosine re-rank of the top ``rerank``·k.

    The 100 TB story: the scan touches codes (m ints) instead of full
    vectors, queries and LUTs broadcast, re-rank joins the full vectors
    for only rerank·k candidate rows per query.
    Returns (query_id, neighbor_id, sim) — sim is exact cosine."""
    from pyspark.sql import Window

    books = pq_train_codebooks(corpus, vec_col, m, codebook_k, seed)
    d = len(books[0][0])
    enc = pq_encode(corpus, id_col, vec_col, books)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # per-query LUT: lut[j][c] = ||qsub_j - center_jc||^2
    qn = _unit(F.col("qvec"))
    lut = F.array(*[
        F.array(*[
            _sq_dist(F.slice(qn, j * d + 1, d), F.array(*[F.lit(x) for x in c]))
            for c in books[j]
        ])
        for j in range(m)
    ])
    ql = q.select("query_id", "qvec", lut.alias("lut"))
    scored = (
        enc.crossJoin(F.broadcast(ql))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", "qvec",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
                lambda acc, j: acc + F.col("lut")[j][F.col("codes")[j]],
            ).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    cands = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rerank * k)
        .select("query_id", "neighbor_id", "qvec")
    )
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    rer = cands.join(full, "neighbor_id").select(
        "query_id", "neighbor_id",
        cosine(F.col("qvec"), F.col("cvec")).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        rer.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def semdedup(
    df: DataFrame, id_col: str, vec_col: str,
    n_clusters: int = 16, threshold: float = 0.95, seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings (k-means) and pruning, WITHIN each cluster,
    every document whose cosine similarity to a kept lower-id document
    exceeds ``threshold``. All-pairs work is confined to clusters —
    corpus²/n_clusters comparisons instead of corpus², and each
    cluster's pair join is an equi-join on the cluster id, so at 100 TB
    the knob is n_clusters (∝ corpus size) keeping per-cluster pair
    counts bounded; no global all-pairs stage exists.

    Drop rule (matching the paper's released implementation): a row is
    a semantic duplicate iff SOME lower-id row in its cluster is within
    ``threshold`` — deterministic, non-recursive, one pair join + one
    aggregation.

    Returns (id, cluster, keep) for every input row.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
    )
    if n_clusters <= 1:
        # degenerate single-cluster mode: the prune is the exact global
        # all-pairs rule (Spark ML KMeans rejects k=1)
        assigned = base.withColumn("cluster", F.lit(0))
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = base.withColumn(
            "features",
            array_to_vector(F.col("vec").cast("array<double>")))
        model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(
            feats.select("features"))
        assigned = model.transform(feats).select(
            "id", "vec", F.col("prediction").alias("cluster"))
    a = assigned.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                        "cluster")
    b = assigned.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                        "cluster")
    # duplicate edges within a cluster, oriented low-id -> high-id
    edges = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select("cluster", "id_a", "id_b")
    )
    dropped = edges.select("id_b").distinct()
    return (
        assigned.join(dropped, assigned.id == dropped.id_b, "left")
        .select("id", "cluster", F.col("id_b").isNull().alias("keep"))
    )
