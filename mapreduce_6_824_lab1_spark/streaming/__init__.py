import mapreduce_6_824_lab1_spark.streaming.jobs  # noqa: F401
import mapreduce_6_824_lab1_spark.streaming.stateful  # noqa: F401
