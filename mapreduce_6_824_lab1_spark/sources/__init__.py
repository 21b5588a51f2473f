import mapreduce_6_824_lab1_spark.sources.roundtrip  # noqa: F401
