"""Tests for data-selection operators (selection.py), Kneser-Ney LM
scoring (ranking.py), SemDeDup (similarity.py), and HLL sketch shards
(sketches.py)."""

import math

import pytest
from pyspark.sql import functions as F

from kineo_spark.pipeline import ranking, selection, similarity, sketches


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # passes every Gopher rule
        (1, "the cat and the dog have fun with all of that play "
            "time in the big yard near the fence and more words here", "srcA"),
        # too short
        (2, "tiny doc", "srcA"),
        # no stopwords
        (3, " ".join(["zzz"] * 30), "srcB"),
        # numbers only -> alpha fraction fails
        (4, " ".join(str(i) for i in range(40)), "srcB"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_gopher_rules_per_rule(docs):
    out = {r["id"]: r for r in selection.gopher_rules(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["rule_words"] is False and out[2]["keep"] is False
    assert out[3]["rule_stop"] is False and out[3]["keep"] is False
    assert out[4]["rule_alpha"] is False and out[4]["keep"] is False
    # feature values are sane
    assert out[1]["n_words"] == 24
    assert out[1]["stop_hits"] >= 2


def test_cap_per_source_cap_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(100)], "doc_id long, source string"
    )
    a = selection.cap_per_source(df, cap=5).collect()
    b = selection.cap_per_source(df.repartition(7), cap=5).collect()
    assert sorted((r["source"], r["id"]) for r in a) == sorted(
        (r["source"], r["id"]) for r in b
    )
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append(r["rank_in_source"])
    assert all(sorted(v) == list(range(1, 6)) for v in per.values())


def test_global_shuffle_partition_invariance_and_coverage(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = selection.global_shuffle(df, seed="sX", n_shards=4).collect()
    b = selection.global_shuffle(df.repartition(13), seed="sX", n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every id appears exactly once; positions are 1..n within shard
    assert sorted(r["id"] for r in a) == list(range(200))
    shards = {}
    for r in a:
        shards.setdefault(r["shard"], []).append(r["pos"])
    for v in shards.values():
        assert sorted(v) == list(range(1, len(v) + 1))
    # a different seed produces a different order
    c = selection.global_shuffle(df, seed="sY", n_shards=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_dsir_weights_prefer_target_like_docs(spark):
    # target docs share a distinctive bigram vocabulary
    rows = [(i, "alpha beta gamma delta alpha beta", "t") for i in range(10)]
    rows += [(i + 10, "omega psi chi phi omega psi", "r") for i in range(10)]
    # one raw doc written in target language: should score high
    rows.append((99, "alpha beta gamma delta", "r"))
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    w = {
        r["id"]: r["weight"]
        for r in selection.dsir_weights(df, F.col("kind") == "t").collect()
    }
    assert w[99] > w[10]  # target-like raw doc beats off-target raw doc
    assert w[0] > w[10]


def test_kn_bigram_logprob_hand_computed(spark):
    # corpus: two docs; bigrams: (a b) x2 in doc1, (a b),(b a) in doc2
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ranking.kn_bigram_logprob(df, "doc_id").collect()}
    # counts: bc(a,b)=2, bc(b,a)=1; c1(a)=2, c1(b)=1; fw(a)=1, fw(b)=1
    # bw(b)=1, bw(a)=1; nb=2; D=0.75
    p_ab = (2 - 0.75) / 2 + (0.75 * 1 / 2) * (1 / 2)
    p_ba = (1 - 0.75) / 1 + (0.75 * 1 / 1) * (1 / 2)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_kn_logprob"] == pytest.approx(math.log(p_ab), abs=1e-6)
    want2 = (math.log(p_ab) + math.log(p_ba)) / 2
    assert out[2]["avg_kn_logprob"] == pytest.approx(want2, abs=1e-6)


def test_semdedup_drops_higher_id_twin(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    # 100/101 duplicate vectors of ids 0/1 (cosine 1.0)
    rows.append((100, [x * 2.0 for x in rows[0][1]]))
    rows.append((101, list(rows[1][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: r["keep"]
        for r in similarity.semdedup(
            df, "vec_id", "embedding", n_clusters=4, threshold=0.99
        ).collect()
    }
    assert out[0] is True and out[1] is True  # lowest-id member survives
    assert out[100] is False and out[101] is False
    assert len(out) == 42


def test_hll_sketch_estimates_close_and_mergeable(spark):
    rows = [(i, f"g{i % 4}") for i in range(5000)]
    df = spark.createDataFrame(rows, "uid long, grp string")
    sk = sketches.sketch_by(df, key="uid", group="grp")
    est = {r["group"]: r["approx_distinct"] for r in sketches.estimate(sk).collect()}
    for g, e in est.items():
        assert abs(e - 1250) / 1250 < 0.05, (g, e)
    merged = sketches.merge_estimate(sk).collect()[0]
    assert merged["n_groups"] == 4 and merged["n_rows"] == 5000
    assert abs(merged["approx_distinct"] - 5000) / 5000 < 0.05


def test_pack_sequences_tiling_invariants(spark):
    from kineo_spark.pipeline import sampling
    from kineo_spark.pipeline.text import token_count

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + (i * 7) % 40))) for i in range(50)],
        "doc_id long, text string",
    )
    L = 16
    out = sampling.pack_sequences(docs, L).collect()
    n_by_doc = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    # every token of every doc lands exactly once
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for did, slices in per_doc.items():
        slices.sort(key=lambda r: r["doc_slice_start"])
        assert sum(s["slice_len"] for s in slices) == n_by_doc[did]
        pos = 0
        for s in slices:
            assert s["doc_slice_start"] == pos
            pos += s["slice_len"]
    # every sequence except the last is exactly full with no overlap
    per_seq = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], []).append(r)
    last = max(per_seq)
    for sid, slices in per_seq.items():
        slices.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for s in slices:
            assert s["seq_offset"] == pos
            pos += s["slice_len"]
        if sid != last:
            assert pos == L
    # deterministic across partitioning
    out2 = sampling.pack_sequences(docs.repartition(11), L).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ppl_buckets_sizes(spark):
    from kineo_spark.pipeline import ranking

    docs = spark.createDataFrame(
        [(i, "a b c d e " + ("a b " * (i % 5))) for i in range(30)],
        "doc_id long, text string",
    )
    out = ranking.ppl_buckets(docs, "doc_id").collect()
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sorted(sizes) == [1, 2, 3] and all(v == 10 for v in sizes.values())


def test_dedup_against_corpus_drops_known_fingerprints(spark):
    from kineo_spark.pipeline import dedup

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "Alpha  beta   GAMMA"),  # normalizes to a seen fingerprint
         (11, "totally new text"),
         (12, "delta epsilon")],
        "doc_id long, text string",
    )
    out = sorted(r["id"] for r in dedup.dedup_against_corpus(new, seen, "doc_id").collect())
    assert out == [11]


def test_kll_quantile_sketches_close_and_mergeable(spark):
    from kineo_spark.pipeline import sketches

    rows = [(float(i % 1000), f"g{i % 4}") for i in range(8000)]
    df = spark.createDataFrame(rows, "v double, grp string")
    sk = sketches.kll_sketch_by(df, value="v", group="grp")
    per = {r["group"]: r for r in sketches.kll_quantiles(sk).collect()}
    for g, r in per.items():
        assert abs(r["q50"] - 500) < 50 and abs(r["q99"] - 990) < 30
    m = sketches.kll_merge_quantiles(sk).collect()[0]
    assert m["n_groups"] == 4 and m["n_rows"] == 8000
    assert abs(m["q50"] - 500) < 50 and abs(m["q90"] - 900) < 40


def test_quality_classifier_separates_synthetic_domains(spark):
    from kineo_spark.pipeline import quality_model

    rows = []
    for i in range(60):
        rows.append((i, "clean prose about science history art " * 4, 1))
    for i in range(60, 120):
        rows.append((i, "buy now click here spam casino win " * 4, 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = quality_model.train_quality_classifier(df, F.col("y") == 1)
    scored = quality_model.score_quality(model, df).collect()
    correct = sum(
        1 for r in scored
        if (r["predicted"] == 1) == (r["id"] < 60)
    )
    assert correct >= 118  # near-perfect on separable data
    # scores are calibrated to the right side
    ps = {r["id"]: r["p_good"] for r in scored}
    assert ps[0] > 0.9 and ps[100] < 0.1


def test_corpus_stats_hand_cases(spark):
    from kineo_spark.pipeline import corpus_stats

    docs = spark.createDataFrame(
        [(1, "a a a b unique1"), (2, "a b c c unique2"), (3, "a b c c c")],
        "doc_id long, text string",
    )
    # vocab_size=3 -> vocab = {a, b, c} (by freq desc); unique* are OOV
    oov = {r["doc_id"]: r for r in corpus_stats.oov_rate(docs, vocab_size=3).collect()}
    assert oov[1]["oov_frac"] == pytest.approx(1 / 5)
    assert oov[3]["oov_frac"] == 0.0
    # doc3 "a b c c c": 3-grams {a b c, b c c, c c c}; the first two
    # also occur in doc2 ("a b c c unique2"), only "c c c" is novel
    nov = {r["doc_id"]: r for r in corpus_stats.novelty(docs).collect()}
    assert nov[3]["n_grams"] == 3
    assert nov[3]["novel_frac"] == pytest.approx(1 / 3)
    # uniform frequencies -> slope 0; skewed -> negative
    flat = spark.createDataFrame([(1, "x y z w")], "doc_id long, text string")
    assert corpus_stats.zipf_slope(flat).collect()[0]["slope"] == 0.0
    skew = spark.createDataFrame(
        [(1, " ".join(["a"] * 64 + ["b"] * 16 + ["c"] * 4 + ["d"]))],
        "doc_id long, text string",
    )
    assert corpus_stats.zipf_slope(skew).collect()[0]["slope"] < -1.0


def test_topk_per_group_equals_naive_window(spark):
    from pyspark.sql import Window

    from kineo_spark.pipeline import skew

    rows = [(i, f"g{i % 5}", float((i * 37) % 101)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string, score double").repartition(13)
    order = [F.desc("score"), F.col("id")]
    got = sorted(
        (r["grp"], r["rank_in_group"], r["id"])
        for r in skew.topk_per_group(df, "grp", order, 7).collect()
    )
    w = Window.partitionBy("grp").orderBy(*order)
    want = sorted(
        (r["grp"], r["rn"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7).collect()
    )
    assert got == want and len(got) == 35


def test_frozen_quality_classifier_exact_and_sane(spark):
    """The frozen-coefficient scorer: exact int64 logits, intercept-only
    rows for token-free docs, and the checked-in model actually
    separates en from non-en on the sf0.001 fixture."""
    import duckdb

    from kineo_spark.pipeline import quality_model

    coefs = quality_model.load_frozen()
    assert coefs["n_features"] == 512
    assert any(c for c in coefs["coef_micro"])

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "   "),           # no tokens → intercept-only logit
        (3, "uno"),           # single token → no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in
           quality_model.score_quality_frozen(spark, df).collect()}
    assert got[2]["logit_micro"] == coefs["intercept_micro"]
    for r in got.values():
        assert r["predicted"] == int(r["logit_micro"] > 0)

    # DuckDB twin on the same tiny frame gives bit-identical logits.
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {i: v for i, v in con.execute(
        "SELECT id, logit_micro FROM (" +
        quality_model.frozen_oracle_sql() + ")").fetchall()}
    assert oracle == {i: r["logit_micro"] for i, r in got.items()}


def test_bloom_prefiltered_incremental_dedup(spark):
    """bloom=True must return exactly the plain anti-join's rows (the
    Bloom routes only definite-negatives around the join; positives
    still hit the exact residual check), the candidate rate must stay
    near the true-dup rate (~1% + sub-1% false positives), and the
    probe-side word joins must be BROADCAST even with autoBroadcast
    disabled — that is the map-side property that kills the daily-side
    shuffle at archive scale."""
    from pyspark.sql import functions as F

    from kineo_spark.pipeline import dedup

    seen = spark.createDataFrame(
        [(i, f"archived doc {i}") for i in range(3000)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"fresh doc {i}") for i in range(2970)]
        + [(10_000 + i, f"archived doc {i}") for i in range(30)],  # 1% dups
        "doc_id long, text string")

    plain = sorted(r["id"] for r in
                   dedup.dedup_against_corpus(new, seen, "doc_id").collect())
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup.dedup_against_corpus(new, seen, "doc_id", bloom=True)
        got = sorted(r["id"] for r in out.collect())
        assert got == plain  # identical by construction
        assert len(got) == 2970

        # candidate rate: Bloom-positives ≈ true dups + small fp tail
        nf = new.select(F.col("doc_id").alias("id"),
                        dedup.fingerprint(F.col("text")).alias("fp"))
        sf = seen.select(dedup.fingerprint(F.col("text")).alias("fp"))
        m_bits = 3000 * 14
        words = dedup._bloom_words(sf, m_bits, 3)
        probed, cand = dedup._bloom_probe(nf, words, m_bits, 3)
        n_pos = probed.filter(cand).count()
        assert 30 <= n_pos <= 30 + 90  # ≤3% false positives (expect ~0.7%)

        # map-side: all three word joins are BroadcastHashJoin despite
        # the -1 threshold (explicit broadcast() hint), so the probe
        # side never shuffles for the Bloom test itself
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_indexed_incremental_dedup_zero_exchange_archive(spark, tmp_path):
    """The persisted bucketed fingerprint index: identical results to
    the un-indexed path, and the archive side of the residual anti-join
    reads its buckets with NO Exchange (the daily side shuffles only
    the candidate slice) — the full 100 TB incremental-dedup shape."""
    from kineo_spark.pipeline import dedup

    seen = spark.createDataFrame(
        [(i, f"archived doc {i}") for i in range(2000)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"fresh doc {i}") for i in range(1980)]
        + [(9_000 + i, f"archived doc {i}") for i in range(20)],
        "doc_id long, text string")
    # bucket count matches spark.sql.shuffle.partitions: the other
    # join side shuffles to the same partitioning, so the bucketed
    # side needs no Exchange (at cluster scale you pick the bucket
    # count once, at ingest, to match the job's partitioning)
    nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dedup.write_corpus_fingerprints(
        seen, "t_fp_index", buckets=nbuckets,
        path=str(tmp_path / "fpidx"))
    try:
        want = sorted(r["id"] for r in
                      dedup.dedup_against_corpus(new, seen, "doc_id").collect())
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = dedup.dedup_against_corpus_indexed(new, "t_fp_index")
            got = sorted(r["id"] for r in out.collect())
            assert got == want and len(got) == 1980
            # plan shape: walk to the anti-join; its ARCHIVE (right)
            # subtree must contain no Exchange — the bucketed scan IS
            # the partitioning
            plan = out._jdf.queryExecution().executedPlan().toString()
            # AQE prints the final plan followed by an "Initial Plan"
            # section — pin the FINAL plan only
            plan = plan.split("Initial Plan")[0]
            assert "SelectedBucketsCount" in plan  # bucketed scan used
            # exactly ONE fp exchange: the daily candidate slice; the
            # archive side of the LeftAnti SMJ reads its buckets
            # pre-partitioned and pre-sorted (no Exchange, no Sort)
            n_exchange = plan.count("Exchange hashpartitioning(fp")
            assert n_exchange == 1, f"archive side exchanged:\n{plan}"
            # no Sort node directly above the bucketed archive scan
            # (sortBy at write time feeds the SMJ directly)
            anti = plan[plan.index("LeftAnti"):]
            scan_pos = anti.index(
                "FileScan parquet spark_catalog.default.t_fp_index")
            archive_side = anti[:scan_pos].splitlines()[-3:]
            assert not any("Sort [fp#" in l and "ASC" in l
                           for l in archive_side), archive_side
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fp_index")


def test_bloom_gate_adaptive(spark):
    """r9 (VERDICT r8 #1): bloom=True must SKIP the Bloom build when
    the seen side already fits the broadcast anti-join — at that scale
    the word-table build + 3 chained probe joins are pure fixed cost.
    The gate keys off spark.sql.autoBroadcastJoinThreshold, so with the
    threshold disabled (the archive regime) the Bloom stays on. Results
    are identical in every arm by construction."""
    from kineo_spark.pipeline import dedup

    assert dedup._parse_spark_size("10485760") == 10485760
    assert dedup._parse_spark_size("10MB") == 10 * 1024 * 1024
    assert dedup._parse_spark_size("1g") == 1024 ** 3
    assert dedup._parse_spark_size("-1") == -1

    seen = spark.createDataFrame(
        [(i, f"archived doc {i}") for i in range(200)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"fresh doc {i}") for i in range(190)]
        + [(9_000 + i, f"archived doc {i}") for i in range(10)],
        "doc_id long, text string")

    # default threshold (10 MB): 200 rows x 96 B << threshold -> gated
    assert dedup._anti_join_broadcasts(spark, 200)
    gated = dedup.dedup_against_corpus(new, seen, "doc_id", bloom=True,
                                       expected_items=200)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan, "Bloom ran despite broadcastable seen side"
    assert sorted(r["id"] for r in gated.collect()) == list(range(190))

    # archive regime: threshold disabled -> Bloom stays on
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not dedup._anti_join_broadcasts(spark, 200)
        bloomed = dedup.dedup_against_corpus(new, seen, "doc_id", bloom=True,
                                             expected_items=200)
        plan = bloomed._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan
        assert sorted(r["id"] for r in bloomed.collect()) == list(range(190))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # a genuinely large expected_items also keeps the Bloom on, even
    # with the default threshold (the 100 TB case: the gate is about
    # the seen side's size, not the conf alone)
    assert not dedup._anti_join_broadcasts(spark, 10_000_000)


def test_indexed_dedup_uses_persisted_bloom(spark, tmp_path):
    """r9: write_corpus_fingerprints persists the Bloom word table
    beside the bucketed index; dedup_against_corpus_indexed must PROBE
    the persisted words (FileScan of {name}_bloom in the plan, no
    bit_or build aggregation per batch) and return exactly the plain
    anti-join's rows. The O(archive) filter build is paid once at
    ingest, not per daily batch."""
    from kineo_spark.pipeline import dedup

    seen = spark.createDataFrame(
        [(i, f"archived doc {i}") for i in range(1500)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"fresh doc {i}") for i in range(1480)]
        + [(9_000 + i, f"archived doc {i}") for i in range(20)],
        "doc_id long, text string")
    nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dedup.write_corpus_fingerprints(
        seen, "t_fp_bloom_idx", buckets=nbuckets,
        path=str(tmp_path / "fpidx"))
    try:
        assert spark.catalog.tableExists("t_fp_bloom_idx_bloom")
        meta = spark.table("t_fp_bloom_idx_bloom").select("m_bits", "k").first()
        assert meta["m_bits"] == 1500 * 14 and meta["k"] == 3

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = dedup.dedup_against_corpus_indexed(new, "t_fp_bloom_idx")
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "t_fp_bloom_idx_bloom" in plan  # persisted words probed
            assert "bit_or" not in plan            # no per-batch build
            got = sorted(r["id"] for r in out.collect())
            assert got == list(range(1480))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fp_bloom_idx")
        spark.sql("DROP TABLE IF EXISTS t_fp_bloom_idx_bloom")
