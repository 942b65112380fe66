from metadata_etl_framework_spark.orchestrator.manager import OrchestratorManager  # noqa: F401
from metadata_etl_framework_spark.orchestrator.scheduler import PipelineScheduler  # noqa: F401
