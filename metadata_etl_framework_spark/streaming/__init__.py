from metadata_etl_framework_spark.streaming.stateful import (  # noqa: F401
    stateful_running_counts,
    stateful_stream_dedup,
)
from metadata_etl_framework_spark.streaming.windows import (  # noqa: F401
    sessionize_batch,
    sliding_window_agg,
    tumbling_window_agg,
)
