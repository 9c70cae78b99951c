"""Round-12 ADVICE regression pins.

- store.graph_terms memo lifetime: the persisted memo must be released
  when its store is discarded (stores are re-created per mutation;
  MEMORY_AND_DISK blocks are not LRU-evicted, so orphans accumulated
  until SparkContext stop).
"""

import gc

from kineo_spark.store import QuadsDataFrameStore

EX = "http://example.org/"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _mk_store(spark):
    rows = [
        (0, EX + "a", EX + "p", 0, EX + "b", None, None, None, "urn:g:1"),
        (0, EX + "c", EX + "p", 0, EX + "d", None, None, None, "urn:g:2"),
    ]
    return QuadsDataFrameStore.from_rows(spark, rows)


def test_graph_terms_memo_released_on_gc(spark):
    base = _n_persistent_rdds(spark)
    store = _mk_store(spark)
    assert store.graph_terms().count() == 2
    assert store.graph_terms() is store.graph_terms()  # memoized
    assert _n_persistent_rdds(spark) > base
    del store
    gc.collect()
    assert _n_persistent_rdds(spark) == base


def test_graph_terms_memo_released_eagerly(spark):
    base = _n_persistent_rdds(spark)
    store = _mk_store(spark)
    store.graph_terms().count()
    assert _n_persistent_rdds(spark) > base
    store.release_cached()
    assert _n_persistent_rdds(spark) == base
    # a later call re-builds (and re-persists) without error
    assert store.graph_terms().count() == 2
    store.release_cached()
    assert _n_persistent_rdds(spark) == base


def test_update_heavy_session_does_not_accumulate_memos(spark):
    """The update.GraphStore pattern: a fresh read store per query —
    each query's memo must die with its store instead of piling up.
    (Updates themselves localCheckpoint the new state, so the baseline
    is taken AFTER the mutations; only query-driven memo growth is the
    regression under test.)"""
    from kineo_spark.update import GraphStore

    gs = GraphStore(spark)
    for i in range(3):
        gs.update(f"INSERT DATA {{ GRAPH <urn:g:{i}> "
                  f"{{ <urn:s:{i}> <urn:p> <urn:o:{i}> }} }}")
    gc.collect()
    base = _n_persistent_rdds(spark)
    for _ in range(3):
        res = gs.query("SELECT ?g WHERE { GRAPH ?g { } }")
        assert res.bindings.count() == 3
        del res
        gc.collect()
    assert _n_persistent_rdds(spark) <= base  # no memo pile-up
