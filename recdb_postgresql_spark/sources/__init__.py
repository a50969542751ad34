from recdb_postgresql_spark.sources.readers import load_table, load_tables, ratings_from_events

__all__ = ["load_table", "load_tables", "ratings_from_events"]
