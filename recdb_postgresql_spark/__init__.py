"""recdb_postgresql_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of DataSystemsLab/recdb-postgresql.

RecDB (reference at /root/reference) is a PostgreSQL 9.2 fork adding
recommendation as a first-class SQL construct (CREATE RECOMMENDER /
RECOMMEND clause, five CF methods, incremental maintenance). This
package re-expresses that surface Spark-first:

- all relational operators (scan/join/agg/window/setop/sort/limit) are
  Spark SQL built-ins — zero custom Catalyst rules needed;
- the recommender surface is a library layer that *emits* DataFrame
  plans (the Spark-native analog of RecDB's parse-time rewrite in
  ``parse_rec.c`` plus the ``RecScan`` executor node);
- model training is set-based DataFrame aggregation + self-joins
  instead of the reference's O(n^2) in-memory triangle matrices
  (``recathon.c:3033-3060``) — faithful semantics, scalable plan;
- beyond the reference, large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing) live
  in ``operators/``.
"""

from recdb_postgresql_spark.engine import RecEngine, get_spark

__all__ = ["RecEngine", "get_spark"]
