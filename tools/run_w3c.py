"""Run W3C-format conformance manifests and record the pass list.

Usage:
  python tools/run_w3c.py [--tap] [--test IRI] [manifest.ttl ...]

Defaults to the vendored suite; point it at rdf-tests' data-r2 /
data-sparql11 manifest.ttl files when they are available on disk.
Writes W3C_RESULTS.md at the repo root (full-suite runs only).

``--tap`` prints Test Anything Protocol lines ("ok # <iri>" /
"not ok # <iri>: reason") and ``--test IRI`` runs a single entry by
its #fragment or full IRI — parity with the reference's kineo-dawg-test
driver (Sources/kineo-dawg-test/main.swift:14-60).
"""

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from kineo_spark.session import get_spark
    from kineo_spark.w3c import manifest_entries, run_entry, run_manifest

    args = sys.argv[1:]
    tap = "--tap" in args
    args = [a for a in args if a != "--tap"]
    only = None
    if "--test" in args:
        i = args.index("--test")
        only = args[i + 1]
        del args[i:i + 2]

    manifests = args or [
        f"/root/repo/tests/w3c/manifest{n}.ttl"
        for n in ("", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11",
                  "12", "13", "14", "15", "16", "17", "18", "19", "20",
                  "21", "22", "23")
    ]
    spark = get_spark("w3c", cpus=8)
    try:
        if only is not None:
            for m in manifests:
                for e in manifest_entries(m):
                    if e.iri == only or e.iri.split("#")[-1] == only:
                        o = run_entry(spark, e)
                        if o.passed:
                            print(f"ok # {e.iri}")
                            return 0
                        print(f"not ok # {e.iri}: {o.detail}")
                        return 1
            print(f"not ok # {only}: no such test", file=sys.stderr)
            return 2

        lines = ["# W3C-format conformance results", ""]
        n_pass = n_fail = 0
        for m in manifests:
            lines.append(f"## {m}")
            for o in run_manifest(spark, m):
                mark = "PASS" if o.passed else "FAIL"
                n_pass += o.passed
                n_fail += not o.passed
                detail = f" — {o.detail}" if o.detail else ""
                lines.append(
                    f"- {mark} `{o.entry.iri.split('#')[-1]}` "
                    f"{o.entry.name}{detail}")
                if tap:
                    if o.passed:
                        print(f"ok # {o.entry.iri}")
                    else:
                        print(f"not ok # {o.entry.iri}: {o.detail}")
                else:
                    print(lines[-1])
            lines.append("")
        lines.append(f"**{n_pass} pass / {n_fail} fail**")
        with open("/root/repo/W3C_RESULTS.md", "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"\n{n_pass} pass, {n_fail} fail -> W3C_RESULTS.md")
        return 1 if n_fail else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
