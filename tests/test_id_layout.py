"""Persisted bucketed ID layout: subject-bucketed 4×long quads give
star self-joins with ZERO exchange — the at-rest analog of the
reference's ordered on-disk indexes (QuadStore.swift:62-88,
IDOrderedQuadPlan), expressed as Spark bucketing."""

import pytest

from pyspark.sql import functions as F

from kineo_spark import algebra as A
from kineo_spark.dictionary import (
    IdEncodedView,
    bgp_ids,
    load_id_layout,
    materialize,
    persist_id_layout,
)
from kineo_spark.model import iri


def _plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def layout(spark, fixture_store, tmp_path_factory):
    view = IdEncodedView.for_store(fixture_store)
    path = str(tmp_path_factory.mktemp("idlayout"))
    persist_id_layout(view, "t_layout", buckets=4, path=path)
    yield load_id_layout(spark, "t_layout")
    spark.sql("DROP TABLE IF EXISTS t_layout_quads")
    spark.sql("DROP TABLE IF EXISTS t_layout_terms")


def test_roundtrip_counts(spark, fixture_store, layout):
    view = IdEncodedView.for_store(fixture_store)
    assert layout.id_quads.count() == view.id_quads.count()
    assert layout.dictionary.count() == view.n_terms


def test_star_join_no_shuffle(spark, layout, fixture_store):
    """Two patterns sharing a subject, forced to a sort-merge join:
    bucketed scans feed the join directly — no Exchange in the plan."""
    pats = [
        A.QuadPattern(A.Var("s"), iri("http://xmlns.com/foaf/0.1/name"), A.Var("n"), None),
        A.QuadPattern(A.Var("s"), iri("http://xmlns.com/foaf/0.1/homepage"), A.Var("h"), None),
    ]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ids = bgp_ids(layout.id_quads, pats)
        plan = _plan(ids)
        assert "Exchange" not in plan, plan
        # one-file-per-bucket write + bucketed-scan ordering: the merge
        # join also skips its Sort (full index-order exploitation,
        # IDQueryPlanner.swift:88-94)
        import re as _re
        assert not _re.search(r"\bSort \[", plan), plan
        # same bindings as the in-memory id view
        view = IdEncodedView.for_store(fixture_store)
        expect = bgp_ids(view.id_quads, pats).count()
        assert ids.count() == expect and expect > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_materialize_from_layout(spark, layout):
    pats = [A.QuadPattern(A.Var("s"), iri("http://xmlns.com/foaf/0.1/name"), A.Var("n"), None)]
    ids = bgp_ids(layout.id_quads, pats)
    mat = materialize(ids, layout.dictionary, broadcast_dict=layout.broadcast)
    rows = mat.collect()
    assert rows and all(r["n"]["lex"] for r in rows)


def test_collision_audit_clean(spark, fixture_store):
    """The audit certifies the real fixture dictionary injective and
    returns its distinct-term count."""
    from kineo_spark.dictionary import audit_id_collisions

    view = IdEncodedView.for_store(fixture_store)
    assert audit_id_collisions(view.dictionary) == view.n_terms


def test_collision_audit_detects_forced_collision(spark, fixture_store):
    """A synthetic collision (two distinct term keys, same id) must fail
    the layout build loudly — this is the 100 TB safety net for the
    64-bit birthday bound (~50% at 5e9 distinct terms)."""
    from kineo_spark.dictionary import IdCollisionError, audit_id_collisions

    view = IdEncodedView.for_store(fixture_store)
    # monkeypatch-by-construction: constant id column = every term collides
    forced = view.dictionary.withColumn("id", F.lit(42).cast("long"))
    with pytest.raises(IdCollisionError, match="colliding 64-bit"):
        audit_id_collisions(forced)
    # and persist_id_layout refuses to write such a layout
    fake = object.__new__(IdEncodedView)
    fake.id_quads = view.id_quads
    fake.dictionary = forced
    with pytest.raises(IdCollisionError):
        persist_id_layout(fake, "t_bad_layout", buckets=2)


def test_collision_repair_rekeys_and_stays_consistent(spark, fixture_store):
    """encode_quads_repaired under a deliberately tiny id space (hash
    mod 64 → many forced collisions): the repaired dictionary is
    injective, id_quads joins back to the same quads as the clean
    encode, and constant scans resolve rekeyed terms via the remap."""
    from pyspark.sql import functions as F
    from kineo_spark.dictionary import (
        _id_expr,
        audit_id_collisions,
        encode_quads,
        encode_quads_repaired,
        scan_ids,
        term_key_tuple,
    )
    from kineo_spark import algebra as A
    from kineo_spark.model import PyTerm

    flat = fixture_store.quads()

    def tiny_id(kind, lex, dt=None, lang=None):
        return F.pmod(_id_expr(kind, lex, dt, lang), F.lit(64)).cast("long")

    dic, quads, remap = encode_quads_repaired(flat, id_fn=tiny_id)
    # injective after repair, and repair actually happened
    assert audit_id_collisions(dic) == dic.count()
    assert len(remap) > 0
    # the repaired id_quads still encodes the same quad multiset:
    # materialize s/p/o/g back via the dictionary and compare counts
    n_flat = flat.count()
    d = dic.select("id", "lex")
    j = quads
    for pos in ("s", "p", "o", "g"):
        j = j.join(d.withColumnRenamed("id", f"{pos}_id")
                    .withColumnRenamed("lex", f"{pos}_lex2"),
                   F.col(pos) == F.col(f"{pos}_id"), "inner") \
             .drop(f"{pos}_id")
    assert j.count() == n_flat
    # a rekeyed constant term is findable through the remap
    (k_, l_, d_, la_), _new_id = next(iter(remap.items()))
    term = PyTerm(kind=int(k_), lex=l_, dt=d_ or None, lang=la_ or None)
    assert term_key_tuple(term.kind, term.lex, term.dt, term.lang) in remap
    hits = 0
    for pattern in (
        A.QuadPattern(term, A.Var("p"), A.Var("o"), A.Var("g")),
        A.QuadPattern(A.Var("s"), term, A.Var("o"), A.Var("g")),
        A.QuadPattern(A.Var("s"), A.Var("p"), term, A.Var("g")),
    ):
        hits += scan_ids(quads, pattern, remap=remap).count()
    assert hits > 0


def test_id128_layout_roundtrip_and_star_join(spark, fixture_store,
                                              tmp_path_factory):
    """key_bits=128 (two-long struct ids, the documented 100 TB
    default): encode/audit/persist/load share the 64-bit code path;
    struct ids are first-class bucket + join keys, so the subject-
    bucketed star join still runs with ZERO exchange; materialize
    restores the same terms as the 64-bit view."""
    view = IdEncodedView.for_store(fixture_store, key_bits=128)
    assert view.key_bits == 128
    assert view.dictionary.schema["id"].dataType.typeName() == "struct"
    path = str(tmp_path_factory.mktemp("idlayout128"))
    persist_id_layout(view, "t_layout128", buckets=4, path=path)
    try:
        layout = load_id_layout(spark, "t_layout128")
        assert layout.key_bits == 128
        assert layout.id_quads.count() == view.id_quads.count()
        pats = [
            A.QuadPattern(A.Var("s"), iri("http://xmlns.com/foaf/0.1/name"), A.Var("n"), None),
            A.QuadPattern(A.Var("s"), iri("http://xmlns.com/foaf/0.1/homepage"), A.Var("h"), None),
        ]
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ids = bgp_ids(layout.id_quads, pats, key_bits=128)
            ids.collect()
            plan = ids._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # same answers as the 64-bit twin, term-for-term
            mat = materialize(ids, layout.dictionary,
                              broadcast_dict=layout.broadcast)
            got = sorted((r["n"]["lex"], r["h"]["lex"]) for r in mat.collect())
            v64 = IdEncodedView.for_store(fixture_store)
            m64 = materialize(bgp_ids(v64.id_quads, pats), v64.dictionary,
                              broadcast_dict=v64.broadcast)
            assert got == sorted((r["n"]["lex"], r["h"]["lex"])
                                 for r in m64.collect())
            assert got
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the audit runs unchanged on struct ids
        from kineo_spark.dictionary import audit_id_collisions
        assert audit_id_collisions(view.dictionary) == view.n_terms
    finally:
        spark.sql("DROP TABLE IF EXISTS t_layout128_quads")
        spark.sql("DROP TABLE IF EXISTS t_layout128_terms")


def test_id128_no_cross_width_collision(spark, fixture_store):
    """The two 64-bit halves are independent hashes: terms engineered to
    share h (the 64-bit id) still differ in l, so the 128-bit audit
    passes where the 64-bit one would fail. Simulated by projecting the
    struct down to its h half — identical to the 64-bit dictionary."""
    from kineo_spark.dictionary import IdEncodedView as V

    v128 = V.for_store(fixture_store, key_bits=128)
    v64 = V.for_store(fixture_store)
    h_only = sorted(r[0] for r in v128.dictionary.select("id.h").collect())
    ids64 = sorted(r[0] for r in v64.dictionary.select("id").collect())
    assert h_only == ids64


def test_valueorder_range_pure_idspace(spark, layout):
    """IDSortPlan analog on the persisted layout: range FILTER + ORDER
    BY on the o_num value shadow run with NO dictionary join before the
    Sort, and the range predicate reaches the parquet scan of the
    bucketed layout (PushedFilters/DataFilters)."""
    import re as _re

    assert "o_num" in layout.id_quads.columns
    from kineo_spark.dictionary import scan_ids

    pat = A.QuadPattern(
        A.Var("s"), iri("urn:col:people:age"), A.Var("age"), None)
    # the fixture store has foaf data; fall back to any predicate with
    # numeric objects so the test is corpus-independent
    scanned = scan_ids(layout.id_quads, pat, with_num=True)
    if scanned.filter(F.col("__num_age").isNotNull()).count() == 0:
        pv = A.Var("p", binding=False)
        pat = A.QuadPattern(A.Var("s"), pv, A.Var("age"), None)
        scanned = scan_ids(layout.id_quads, pat, with_num=True)
    top = (scanned.filter(F.col("__num_age") > 0)
           .orderBy(F.col("__num_age").desc()).limit(5))
    top.collect()
    plan = top._jdf.queryExecution().executedPlan().toString()
    # sort happens in pure id space: no join of any kind in this plan
    assert not _re.search(r"Join", plan), plan
    # the range predicate reached the file scan
    assert _re.search(r"(PushedFilters|DataFilters): \[.*o_num", plan) \
        or "o_num" in plan.split("FileScan", 1)[-1], plan
    assert "Sort" in plan or "TakeOrderedAndProject" in plan, plan


def test_strorder_range_pure_idspace(spark, layout):
    """STRING IDSortPlan analog (IdentityMap.swift:53-80 short-string
    inlining): on an audit-certified all-inline layout, a string range
    FILTER + ORDER BY runs join-free on the o_str shadow, with the
    prefix predicate pushed to the bucketed layout's parquet scan."""
    import re as _re

    from kineo_spark.dictionary import audit_str_inline, str_range_ids

    assert "o_str" in layout.id_quads.columns
    # the fixture's simple strings are all ≤ STR_SHADOW_LEN — certified
    # at build time (kineo.str_inline table property) AND by re-audit
    assert layout.str_inline
    assert audit_str_inline(layout.dictionary)
    pat = A.QuadPattern(
        A.Var("s"), A.Var("p", binding=False), A.Var("v"), None)
    out = str_range_ids(layout.id_quads, pat, "A", "z", dictionary=None)
    top = out.orderBy(F.col("__str_v").desc()).limit(5)
    vals = [r["__str_v"] for r in top.collect()]
    # string literals only (plain + langString — the engine's string
    # ordering domain): typed/IRI objects never enter
    assert vals == ["hello", "a number", "Santa Monica", "Berlin"]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert not _re.search(r"Join", plan), plan
    assert _re.search(r"(PushedFilters|DataFilters): \[.*o_str", plan) \
        or "o_str" in plan.split("FileScan", 1)[-1], plan
    assert "Sort" in plan or "TakeOrderedAndProject" in plan, plan


def test_strorder_overflow_fallback(spark):
    """Strings longer than the shadow width: the prefix predicate still
    prunes (superset), and the dictionary refine restores EXACT range
    semantics for boundary rows whose 32-char prefixes tie."""
    from kineo_spark.dictionary import (
        STR_SHADOW_LEN, audit_str_inline, encode_quads, str_range_ids,
    )
    from kineo_spark.store import QuadsDataFrameStore

    n = STR_SHADOW_LEN
    lo = "Customer#A"
    hi = "Customer#A" + "x" * 25          # 35 chars: beyond the shadow
    s_in = "Customer#A" + "x" * 22 + "aaa"  # ties hi's prefix, < hi
    s_out = "Customer#A" + "x" * 22 + "zzz"  # ties hi's prefix, > hi
    s_short = "Customer#Ab"                  # inline, in range
    s_below = "Customer#"                    # < lo
    rows = [
        (0, f"urn:s{i}", "urn:p", 2, v, "string", None, None, "urn:g")
        for i, v in enumerate([s_in, s_out, s_short, s_below])
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    dictionary, id_quads = encode_quads(store.quads())
    assert not audit_str_inline(dictionary)  # overflow strings present
    pat = A.QuadPattern(
        A.Var("s"), A.Var("p", binding=False), A.Var("v"), None)
    out = str_range_ids(id_quads, pat, lo, hi, dictionary=dictionary)
    got = sorted(r["__str_v"] for r in out.collect())
    # s_out shares s_in's 32-char prefix — only the dictionary refine
    # can exclude it; s_below is pruned by the pushed prefix predicate
    assert got == sorted([s_in[:n], s_short])


def test_strorder_randomized_vs_bruteforce(spark):
    """Randomized hardening of the prefix-range logic: a corpus mixing
    lengths around the shadow width, shared boundary prefixes, astral
    code points, and the empty string, checked against a brute-force
    Python evaluation for a batch of random bounds. Full lexical forms
    (not prefixes) are compared, so boundary swaps can't hide."""
    import random

    from kineo_spark.dictionary import (
        STR_SHADOW_LEN, encode_quads, str_range_ids,
    )
    from kineo_spark.store import QuadsDataFrameStore

    n = STR_SHADOW_LEN
    rng = random.Random(20260815)
    alphabet = "abAB01 éß€\U0001F600"  # multi-byte + astral code points
    corpus = {""}
    for ln in (n - 1, n, n + 1, 2 * n):
        base = "".join(rng.choice(alphabet) for _ in range(ln))
        corpus.add(base)
        if ln >= n:
            # shared shadow prefix, divergence past the boundary
            corpus.add(base[:n] + "zz")
            corpus.add(base[:n] + "aa")
    while len(corpus) < 60:
        corpus.add("".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 2 * n))))
    corpus = sorted(corpus)
    rows = [
        (0, f"urn:s{i}", "urn:p", 2, s, "string", None, None, "urn:g")
        for i, s in enumerate(corpus)
    ]
    store = QuadsDataFrameStore.from_rows(spark, rows)
    dictionary, id_quads = encode_quads(store.quads())
    id_quads = id_quads.cache()
    pat = A.QuadPattern(
        A.Var("s"), A.Var("p", binding=False), A.Var("v"), None)
    lex_of = {r["id"]: r["lex"] for r in dictionary.collect()}
    for _ in range(8):
        lo, hi = sorted(rng.sample(corpus, 2))
        out = str_range_ids(id_quads, pat, lo, hi, dictionary=dictionary)
        got = sorted(lex_of[r["v"]] for r in out.collect())
        want = sorted(s for s in corpus if lo <= s <= hi)
        assert got == want, (lo, hi, got[:5], want[:5])
