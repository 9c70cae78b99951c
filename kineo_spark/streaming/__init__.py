from kineo_spark.streaming import events  # noqa: F401
