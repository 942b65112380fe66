from metadata_etl_framework_spark.sources.file_connector import FileConnector  # noqa: F401
from metadata_etl_framework_spark.sources.registry import create_connector  # noqa: F401
