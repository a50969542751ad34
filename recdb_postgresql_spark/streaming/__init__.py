from recdb_postgresql_spark.streaming.maintenance import StreamingMaintainer

__all__ = ["StreamingMaintainer"]
