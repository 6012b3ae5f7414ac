from metrics_service_spark.testing.oracle import OracleMismatch, compare_query, run_oracle

__all__ = ["OracleMismatch", "compare_query", "run_oracle"]
