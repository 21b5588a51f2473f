import mapreduce_6_824_lab1_spark.sources.roundtrip  # noqa: F401
import mapreduce_6_824_lab1_spark.sources.pydatasource  # noqa: F401
