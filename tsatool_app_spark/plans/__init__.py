from tsatool_app_spark.plans.driver_queries import QUERIES, spark_queries, oracle_sqls

__all__ = ["QUERIES", "spark_queries", "oracle_sqls"]
