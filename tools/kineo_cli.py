#!/usr/bin/env python3
"""kineo-spark CLI — analog of the reference's kineo-cli
(/root/reference/Sources/kineo-cli/main.swift): load RDF files into a
parquet quadstore, run SPARQL queries, dump graphs.

Usage:
  python tools/kineo_cli.py load  STORE_PATH FILE [...]     # .nt/.nq/.ttl
  python tools/kineo_cli.py query STORE_PATH 'SELECT ...' [--format MIME]
  python tools/kineo_cli.py qfile STORE_PATH QUERY_FILE [--format MIME]
  python tools/kineo_cli.py explain STORE_PATH 'SELECT ...' [--mode MODE]
  python tools/kineo_cli.py graphs STORE_PATH               # list graph IRIs
  python tools/kineo_cli.py dataset STORE_PATH              # describe dataset
  python tools/kineo_cli.py parse  - 'SELECT ...' [--simplify]  # algebra dump
  python tools/kineo_cli.py repl  STORE_PATH                # interactive
  python tools/kineo_cli.py dump  STORE_PATH                # N-Quads to stdout
  python tools/kineo_cli.py rel-query SF_DIR 'SELECT ...'   # driver tables
  python tools/kineo_cli.py simple STORE_PATH FILE|'DSL'    # stack DSL (QueryParser.swift analog)
  python tools/kineo_cli.py client ENDPOINT_URL 'SELECT ...'  # kineo-client analog: remote store, local eval
  python tools/kineo_cli.py analyze STORE_PATH              # characteristic-set stats (ANALYZE analog)
  python tools/kineo_cli.py id-layout STORE_PATH [OUT_DIR] [--key-bits 128|64]
      # persist the bucketed, sorted ID layout. Default --key-bits 128
      # (two-long struct ids): collision-safe at any corpus size and the
      # documented default for >=1e9-term stores (SCALE.md). --key-bits 64
      # halves the shuffle currency when the term count stays well under
      # the 64-bit birthday bound (~1e9 terms) — sub-TB stores only.
"""

from __future__ import annotations

import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd, target = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    fmt = "application/sparql-results+json"
    if "--format" in rest:
        i = rest.index("--format")
        fmt = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]

    sys.path.insert(0, "/root/repo")

    if cmd == "parse":
        # kineo-parse analog (/root/reference/Sources/kineo-parse/main.swift):
        # parse the query and print its algebra; --simplify additionally
        # runs the rewrite passes (SPARQLQueryRewriter.simplify analog).
        # No SparkSession needed.
        from kineo_spark import algebra as A
        from kineo_spark.explain import serialize_algebra, serialize_query
        from kineo_spark.rewrite import rewrite
        from kineo_spark.sparql_parser import parse_query

        simplify = "--simplify" in rest
        text = rest[0] if rest and rest[0] != "--simplify" else target
        if text == "-":
            text = sys.stdin.read()
        q = parse_query(text)
        print(serialize_query(q), end="")
        if simplify and hasattr(q, "algebra"):
            print("# simplified:")
            print(serialize_algebra(rewrite(q.algebra)), end="")
        return 0

    from kineo_spark import get_spark
    from kineo_spark.engine import Engine

    spark = get_spark("kineo-cli")

    if cmd == "load":
        from kineo_spark.sources import load_rdf
        from kineo_spark.sources.stores_ext import ParquetQuadStore
        import os

        files = rest
        quads = None
        for f in files:
            q = load_rdf(spark, f)
            quads = q if quads is None else quads.unionByName(q)
        if quads is None:
            print("no input files")
            return 2
        if os.path.exists(target):
            ParquetQuadStore(spark, target).load(quads)
        else:
            ParquetQuadStore.create(spark, quads, target)
        print(f"loaded {quads.count()} quads into {target}")
        return 0

    if cmd in ("query", "qfile", "rel-query", "simple"):
        import os

        text = rest[0]
        if cmd == "qfile" or (cmd == "simple" and os.path.exists(text)):
            with open(rest[0]) as fh:
                text = fh.read()
        if cmd == "rel-query":
            from kineo_spark.store import RelationalQuadStore
            store = RelationalQuadStore(spark, target)
        else:
            from kineo_spark.sources.stores_ext import ParquetQuadStore
            store = ParquetQuadStore(spark, target)
        engine = Engine(store)
        result = engine.query_simple(text) if cmd == "simple" else engine.query(text)
        print(engine.serialize(result, fmt))
        return 0

    if cmd == "client":
        # kineo-client analog (kineo-client/main.swift:21-120): evaluate
        # the query locally against a remote SPARQL endpoint store —
        # every pattern scan becomes a remote pattern query.
        from kineo_spark.sources.stores_ext import SparqlEndpointStore

        engine = Engine(SparqlEndpointStore(spark, target))
        print(engine.serialize(engine.query(rest[0]), fmt))
        return 0

    if cmd == "explain":
        # kineo explain analog (kineo-cli/main.swift:275-333): parsed
        # query + the plan that will run (Catalyst's, not a custom cost
        # search — SURVEY §4.2: Catalyst replaces the planner wholesale)
        from kineo_spark.sources.stores_ext import ParquetQuadStore

        mode = "formatted"
        if "--mode" in rest:
            i = rest.index("--mode")
            mode = rest[i + 1]
            rest = rest[:i] + rest[i + 2:]
        store = ParquetQuadStore(spark, target)
        if "--analyze" in rest:
            # per-operator runtime metrics (rows + times), the analog of
            # the reference's QueryPlan wall-time tree
            # (SPARQL/QueryPlan.swift:11-111) — executes the query
            from kineo_spark.explain import explain_analyze

            rest = [a for a in rest if a != "--analyze"]
            print(explain_analyze(Engine(store), rest[0]))
            return 0
        print(Engine(store).explain(rest[0], mode))
        return 0

    if cmd in ("graphs", "dataset"):
        # kineo graphs / kineo dataset analogs
        # (kineo-cli/main.swift:336-391)
        from pyspark.sql import functions as F
        from kineo_spark.sources.stores_ext import ParquetQuadStore

        store = ParquetQuadStore(spark, target)
        names = [
            r.g for r in store.quads()
            .select(F.col("g_lex").alias("g")).distinct().orderBy("g").collect()
        ]
        if cmd == "graphs":
            for g in names:
                print(g)
        else:
            print("Dataset:")
            print("\tDefault graphs:")
            for g in names[:1]:
                print(f"\t\t{g}")
            if len(names) > 1:
                print("\tNamed graphs:")
                for g in names[1:]:
                    print(f"\t\t{g}")
        return 0

    if cmd == "repl":
        # kineo repl analog (kineo-cli/main.swift:152-239): read SPARQL
        # queries (or 'explain QUERY') interactively until 'exit'
        from kineo_spark.sources.stores_ext import ParquetQuadStore

        engine = Engine(ParquetQuadStore(spark, target))
        while True:
            try:
                line = input("kineo> ").strip()
            except EOFError:
                break
            if line in ("exit", "quit"):
                break
            if not line:
                continue
            try:
                if line.startswith("explain "):
                    print(engine.explain(line[len("explain "):]))
                else:
                    print(engine.serialize(engine.query(line), fmt))
            except Exception as e:  # noqa: BLE001 — REPL keeps going
                print(f"*** {e}")
        return 0

    if cmd == "dump":
        from kineo_spark.sources.ntriples import serialize_ntriples
        from kineo_spark.sources.stores_ext import ParquetQuadStore

        store = ParquetQuadStore(spark, target)
        for r in serialize_ntriples(store.quads(), with_graph=True).toLocalIterator():
            print(r.line)
        return 0

    if cmd == "analyze":
        # ANALYZE TABLE analog: build + print the characteristic-set
        # statistics that power the COUNT-star shortcut and the
        # selectivity-driven BGP join order (Compiler cs_stats=True;
        # DiomedeQuadStore.swift:14-97 analog)
        from kineo_spark.sources.stores_ext import ParquetQuadStore
        from kineo_spark.stats import CharacteristicSets

        store = ParquetQuadStore(spark, target)
        stats = CharacteristicSets.for_store(store)
        n_sets = len(stats._sets)
        print(f"characteristic sets: {n_sets}")
        for (g, cs), ent in sorted(stats._sets.items())[:50]:
            print(f"  graph={g} subjects={ent['subjects']} preds={list(cs)}")
        if n_sets > 50:
            print(f"  ... ({n_sets - 50} more)")
        return 0

    if cmd == "id-layout":
        # persist the dictionary-encoded, subject-bucketed sorted
        # layout (the reference's ordered on-disk index orders analog).
        # key_bits defaults to 128 (two-long struct ids) — the
        # collision-safe width SCALE.md documents as the >=1e9-term
        # default; 64 is the opt-in small-store fast path.
        from kineo_spark.dictionary import IdEncodedView, persist_id_layout
        from kineo_spark.sources.stores_ext import ParquetQuadStore

        key_bits = 128
        if "--key-bits" in rest:
            i = rest.index("--key-bits")
            key_bits = int(rest[i + 1])
            rest = rest[:i] + rest[i + 2:]
        if key_bits not in (64, 128):
            print("--key-bits must be 64 or 128")
            return 2
        out = rest[0] if rest else target + "_idlayout"
        store = ParquetQuadStore(spark, target)
        view = IdEncodedView.for_store(store, key_bits=key_bits)
        persist_id_layout(view, "kineo", path=out)
        print(f"persisted ID layout -> {out} "
              f"({view.n_terms} terms, key_bits={key_bits})")
        return 0

    if cmd == "update":
        # SPARQL 1.1 Update against a parquet quadstore (extension; the
        # post-state rewrites only the affected graph partitions'
        # layout via the partitioned overwrite in create())
        from kineo_spark.sources.stores_ext import ParquetQuadStore
        from kineo_spark.update import GraphStore

        store = ParquetQuadStore(spark, target)
        # GraphStore checkpoints each op eagerly, so the post-state no
        # longer depends on the files being overwritten
        gs = GraphStore(spark, store.quads()).update(rest[0])
        ParquetQuadStore.create(spark, gs.quads, target)
        print(f"updated {target}: {gs.quads.count()} quads")
        return 0

    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
