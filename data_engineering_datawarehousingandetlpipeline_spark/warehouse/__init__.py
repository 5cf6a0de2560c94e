from data_engineering_datawarehousingandetlpipeline_spark.warehouse.store import (  # noqa: F401
    WarehouseTable,
)
