from metrics_service_spark.plans.metrics_request import (
    MetricsRequestPlanner,
    MetricsTables,
)

__all__ = ["MetricsRequestPlanner", "MetricsTables"]
