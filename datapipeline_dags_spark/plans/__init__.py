from datapipeline_dags_spark.plans.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]
