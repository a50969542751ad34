"""Engine-level column functions: portable hashing, vector math,
deterministic sampling."""

from recdb_postgresql_spark.functions.encoding import target_encode_loo
from recdb_postgresql_spark.functions.hashing import md5_long, seeded_hash
from recdb_postgresql_spark.functions.sampling import (group_cap,
                                                       hash_bucket,
                                                       hash_sample)
from recdb_postgresql_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = ["md5_long", "seeded_hash", "cosine_sim", "dot", "l2_norm",
           "hash_bucket", "hash_sample", "group_cap", "target_encode_loo"]
