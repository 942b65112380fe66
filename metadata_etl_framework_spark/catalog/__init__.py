from metadata_etl_framework_spark.catalog.store import ConfigLoader, MetadataStore  # noqa: F401
