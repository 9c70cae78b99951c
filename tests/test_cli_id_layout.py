"""End-to-end CLI smoke: load RDF → persist the ID layout with the
DEFAULT key width (128-bit two-long struct ids, the SCALE.md >=1e9-term
default) → reopen the layout and query it in id space."""

import sys

sys.path.insert(0, "/root/repo/tools")


def _run_cli(argv):
    import kineo_cli
    old = sys.argv
    sys.argv = ["kineo_cli.py", *argv]
    try:
        return kineo_cli.main()
    finally:
        sys.argv = old


def test_cli_id_layout_defaults_to_128(spark, tmp_path):
    nt = tmp_path / "mini.nt"
    nt.write_text("".join(
        f"<http://e/s{i % 7}> <http://e/p{i % 3}> \"{i}\" .\n"
        for i in range(60)))
    store = str(tmp_path / "store")
    assert _run_cli(["load", store, str(nt)]) == 0
    out = str(tmp_path / "layout128")
    assert _run_cli(["id-layout", store, out]) == 0

    from kineo_spark.dictionary import load_id_layout
    layout = load_id_layout(spark, "kineo")
    assert layout.key_bits == 128
    assert layout.dictionary.schema["id"].dataType.typeName() == "struct"
    # quads and dictionary agree: every id in the quads resolves
    q = layout.id_quads.select("s").distinct()
    d = layout.dictionary.select("id")
    assert q.join(d, q["s"] == d["id"], "left_anti").count() == 0
    assert layout.id_quads.count() == 60


def test_cli_id_layout_64_opt_in(spark, tmp_path):
    nt = tmp_path / "mini64.nt"
    nt.write_text("<http://e/a> <http://e/p> \"1\" .\n")
    store = str(tmp_path / "store64")
    assert _run_cli(["load", store, str(nt)]) == 0
    out = str(tmp_path / "layout64")
    assert _run_cli(["id-layout", store, out, "--key-bits", "64"]) == 0
    from kineo_spark.dictionary import load_id_layout
    layout = load_id_layout(spark, "kineo")
    assert layout.key_bits == 64

    # invalid width fails loudly
    assert _run_cli(["id-layout", store, out, "--key-bits", "96"]) == 2
