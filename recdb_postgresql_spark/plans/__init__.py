from recdb_postgresql_spark.plans.sql_rewriter import RecSQL

__all__ = ["RecSQL"]
