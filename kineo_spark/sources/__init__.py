from kineo_spark.sources import ntriples  # noqa: F401
