"""Run W3C-format conformance manifests and record the pass list.

Usage: python tools/run_w3c.py [manifest.ttl ...]
Defaults to the vendored suite; point it at rdf-tests' data-r2 /
data-sparql11 manifest.ttl files when they are available on disk.
Writes W3C_RESULTS.md at the repo root.
"""

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from kineo_spark.session import get_spark
    from kineo_spark.w3c import run_manifest

    manifests = sys.argv[1:] or [
        f"/root/repo/tests/w3c/manifest{n}.ttl"
        for n in ("", "2", "3", "4", "5", "6", "7", "8", "9", "10")
    ]
    spark = get_spark("w3c", cpus=8)
    lines = ["# W3C-format conformance results", ""]
    n_pass = n_fail = 0
    for m in manifests:
        lines.append(f"## {m}")
        for o in run_manifest(spark, m):
            mark = "PASS" if o.passed else "FAIL"
            n_pass += o.passed
            n_fail += not o.passed
            detail = f" — {o.detail}" if o.detail else ""
            lines.append(f"- {mark} `{o.entry.iri.split('#')[-1]}` {o.entry.name}{detail}")
            print(lines[-1])
        lines.append("")
    lines.append(f"**{n_pass} pass / {n_fail} fail**")
    with open("/root/repo/W3C_RESULTS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"\n{n_pass} pass, {n_fail} fail -> W3C_RESULTS.md")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
