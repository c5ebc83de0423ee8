from hive_processor_spark.plans.asserts import plan_string  # noqa: F401
