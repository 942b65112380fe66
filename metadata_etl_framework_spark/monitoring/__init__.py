from metadata_etl_framework_spark.monitoring.alerts import AlertManager  # noqa: F401
from metadata_etl_framework_spark.monitoring.audit import AuditLogger  # noqa: F401
from metadata_etl_framework_spark.monitoring.sla import SLAMonitor  # noqa: F401
