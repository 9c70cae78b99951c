"""Deterministic sampling / splitting / shard packing / dedup
clustering (pipeline extension): hash-gate selections must match an
independent md5 recomputation exactly, splits must partition, packing
must respect the running budget, clusters must propagate transitively."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from kineo_spark.pipeline import dedup, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, lang=["en", "de", "fr"][i % 3], n_chars=100 + 7 * (i % 13))
        for i in range(300)
    ]
    return spark.createDataFrame(rows)


def _py_bucket(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def test_sample_matches_independent_md5(docs):
    got = {r["doc_id"] for r in
           sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    thr = sampling.threshold(0.3)
    want = {i for i in range(300) if _py_bucket(i) < thr}
    assert got == want and 0 < len(got) < 300


def test_stratified_rates(docs):
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.5}, default_rate=0.0)
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by["en"] == 100          # rate 1.0 keeps every en doc
    assert "fr" not in by           # default 0.0 drops the rest
    assert 25 <= by.get("de", 0) <= 75  # ~half


def test_hash_split_partitions(docs):
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.select("doc_id", "split").collect()
    # hash ranges are truncated per weight, so at most a couple of
    # bucket values fall off the end — never a whole percent
    assert len(rows) >= 298
    assert len({r["doc_id"] for r in rows}) == len(rows)  # disjoint
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r["split"]] += 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_pack_shards_budget(docs):
    out = sampling.pack_shards(
        docs, "doc_id", "n_chars", 1000, partition_by="lang")
    rows = sorted(out.select("lang", "doc_id", "n_chars", "shard").collect(),
                  key=lambda r: (r["lang"], r["doc_id"]))
    run, prev = {}, {}
    for r in rows:
        lang = r["lang"]
        before = run.get(lang, 0)
        assert r["shard"] == before // 1000  # running-sum definition
        assert r["shard"] >= prev.get(lang, 0)  # contiguous, nondecreasing
        run[lang] = before + r["n_chars"]
        prev[lang] = r["shard"]


def test_dedup_clusters_transitive(spark):
    # 4-member group needs labels to walk a 3-edge chain; canonical is
    # the min id even for members never directly paired with it
    rows = [
        Row(doc_id=i, text=t) for i, t in [
            (1, "same text"), (5, "same text"), (9, "same text"),
            (12, "same text"),
            (2, "other text"), (7, "other text"),
            (3, "unique snowflake"),
        ]
    ]
    got = {
        (r["doc_id"], r["canon"])
        for r in dedup.dedup_clusters(
            spark.createDataFrame(rows), "doc_id").collect()
    }
    assert got == {(1, 1), (5, 1), (9, 1), (12, 1), (2, 2), (7, 2)}


def test_prefix_key_clusters(spark):
    rows = [
        Row(doc_id=1, text="The quick brown fox jumps over A"),
        Row(doc_id=2, text="the  quick Brown fox JUMPS over B entirely"),
        Row(doc_id=3, text="a different start here now ok"),
    ]
    out = dedup.dedup_clusters(
        spark.createDataFrame(rows), "doc_id",
        key=dedup.prefix_key(F.col("text"), 5))
    assert {(r["doc_id"], r["canon"]) for r in out.collect()} == {(1, 1), (2, 1)}


def test_temperature_sample_flattens(spark):
    from kineo_spark.pipeline import sampling

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = sampling.temperature_sample(df, "doc_id", "stratum", alpha=0.5).collect()
    kept = {}
    rates = {}
    for r in out:
        kept[r["stratum"]] = kept.get(r["stratum"], 0) + 1
        rates[r["stratum"]] = r["rate"]
    # smallest stratum keeps everything; big stratum ~ sqrt(100/900)=1/3
    assert kept["small"] == 100 and rates["small"] == 1.0
    assert rates["big"] == pytest.approx(1 / 3, abs=1e-6)
    assert abs(kept["big"] - 300) < 60
    # deterministic across partitioning
    out2 = sampling.temperature_sample(
        df.repartition(9), "doc_id", "stratum", alpha=0.5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
