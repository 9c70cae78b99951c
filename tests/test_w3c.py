"""W3C-format conformance suite: the manifest runner (kineo_spark.w3c,
mirroring SPARQLTestSuite.swift:432-500) over the vendored mini-suite in
tests/w3c/ — value-semantics long tail the hand-written oracles do not
pin (error propagation, type promotion, bnode bijection, UNDEF
compatibility, empty-aggregate semantics)."""

import pytest

from kineo_spark.w3c import manifest_entries, run_entry

ENTRIES = (manifest_entries("/root/repo/tests/w3c/manifest.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest2.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest3.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest4.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest5.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest6.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest7.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest8.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest9.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest10.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest11.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest12.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest13.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest14.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest15.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest16.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest17.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest18.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest19.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest20.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest21.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest22.ttl")
           + manifest_entries("/root/repo/tests/w3c/manifest23.ttl"))


def test_manifest_parsed():
    assert len(ENTRIES) == 328
    assert all(e.query_path for e in ENTRIES)
    # every evaluation entry checks SOMETHING: a result document, or
    # (update entries) expected named-graph post-state
    assert all(e.result_path or e.result_graph_data
               for e in ENTRIES if "SyntaxTest" not in e.type)


@pytest.mark.parametrize("entry", ENTRIES, ids=[e.iri.split("#")[-1] for e in ENTRIES])
def test_w3c_entry(spark, entry):
    outcome = run_entry(spark, entry)
    assert outcome.passed, f"{entry.name}: {outcome.detail}"
