from data_engineering_datawarehousingandetlpipeline_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
)
