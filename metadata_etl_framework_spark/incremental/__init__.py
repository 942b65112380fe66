from metadata_etl_framework_spark.incremental.watermark import WatermarkStore  # noqa: F401
from metadata_etl_framework_spark.incremental.delta import (  # noqa: F401
    apply_cdc_delta,
    delta_available,
    merge_upsert_delta,
    read_change_feed,
    scd2_merge_delta,
)
from metadata_etl_framework_spark.incremental.merge import (  # noqa: F401
    keep_latest,
    merge_upsert,
    scd2_identify_changes,
    split_late_data,
)
