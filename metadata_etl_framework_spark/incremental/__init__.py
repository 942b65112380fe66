from metadata_etl_framework_spark.incremental.watermark import WatermarkStore  # noqa: F401
from metadata_etl_framework_spark.incremental.merge import (  # noqa: F401
    keep_latest,
    merge_upsert,
    scd2_identify_changes,
    split_late_data,
)
