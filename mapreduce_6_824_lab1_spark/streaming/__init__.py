import mapreduce_6_824_lab1_spark.streaming.jobs  # noqa: F401
