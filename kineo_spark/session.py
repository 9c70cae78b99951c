"""SparkSession factory with scale-oriented defaults.

Single place where engine-relevant configs live so tests, bench and the
driver entry all run the same way. On a real cluster only master/shuffle
partitions change; the semantic configs (timezone, AQE, Arrow) hold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desirable) to set at runtime on a session we
# did not create ourselves (the driver owns the session for entry()).
_RUNTIME_CONFS = {
    # SPARQL dateTime semantics are UTC-calendar based (reference:
    # Sources/Kineo/SPARQL/Expression.swift:115-176 uses UTC components).
    "spark.sql.session.timeZone": "UTC",
    # events.parquet is written with TIMESTAMP(NANOS) which Spark refuses
    # by default; read as long and convert to microseconds ourselves.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: skew joins, coalesced shuffle partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few pandas-UDF operators (pipeline/).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deeply nested SPARQL expressions compile to nested lambda bindings
    # (expr._let_deep); each nesting level costs analyzer iterations.
    "spark.sql.analyzer.maxIterations": "500",
    # PySpark 4 wraps EVERY Column operation with Python call-site
    # capture for richer error messages — ~5 driver->JVM round trips
    # per op (PySparkCurrentOrigin get/set/clear + conf read). SPARQL
    # expression compilation creates tens of thousands of Column ops
    # per query (term-struct CASE chains), so this tagging dominated
    # compile time (measured: ~10k of 14.5k JVM calls for an 8-branch
    # computed IN). Error call sites point into our compiler anyway,
    # never at user code — disable. (Read once and cached by
    # pyspark.errors.utils at first Column op, hence a builder conf.)
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Bucketed+sorted ID layouts (dictionary.persist_id_layout) are
    # written one-file-per-bucket; let the scan report that sort order
    # so merge joins skip their Sort (the IDOrderedQuadPlan analog).
    # The flag only adds a planning-time file-count check — Spark still
    # refuses to claim ordering for multi-file buckets.
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime configs to an externally provided session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; keep going
    return spark


def get_spark(app: str = "kineo-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # local mode runs driver+executors in ONE JVM: size the heap for
        # all of them or long full-GC pauses dominate multi-query runs
        .config("spark.driver.memory", os.environ.get("KINEO_DRIVER_MEM", "24g"))
        # UI off by default (overhead); KINEO_UI=1 enables it so bench.py
        # can read per-stage shuffle metrics from the REST API
        .config("spark.ui.enabled", "true" if os.environ.get("KINEO_UI") else "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return tune(spark)
