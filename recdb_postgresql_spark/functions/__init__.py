"""Engine-level column functions: portable hashing, vector math, text."""

from recdb_postgresql_spark.functions.hashing import md5_long, seeded_hash
from recdb_postgresql_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = ["md5_long", "seeded_hash", "cosine_sim", "dot", "l2_norm"]
