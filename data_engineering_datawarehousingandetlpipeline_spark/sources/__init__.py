from data_engineering_datawarehousingandetlpipeline_spark.sources.readers import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    read_observations_json,
)
