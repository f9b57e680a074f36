from finalpipeline_spark.queries.registry import QUERIES, QuerySpec, load_all, register

__all__ = ["QUERIES", "QuerySpec", "load_all", "register"]
