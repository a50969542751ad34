"""Scale stress: synthetically amplify the sf0.1 events table in-plan
(union with shifted user ids — no files written, testdata untouched)
and time the item-cos + user-cos training pipelines at ~sf1 and ~sf3
equivalents. This is the 'would the plan survive a 10-30x scale-up'
probe: the pair join stays sparse, partial aggregation stays map-side,
and shuffle partition counts follow data volume.

Run: python stress.py [multiplier ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import get_spark
from recdb_postgresql_spark.operators import cf
from recdb_postgresql_spark.sources.readers import load_table, ratings_from_events


def amplified_ratings(spark, sf_dir: str, mult: int):
    ev = ratings_from_events(load_table(spark, sf_dir, "events"))
    parts = [ev.select((F.col("userid") + F.lit(i * 1_000_000)).alias("userid"),
                       "itemid", "ratingval") for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return cf.normalize_events(out, "userid", "itemid", "ratingval")


def main():
    mults = [int(x) for x in sys.argv[1:]] or [10, 30]
    spark = get_spark("recdb_stress")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    for mult in mults:
        r = amplified_ratings(spark, sf_dir, mult)
        n = r.count()
        t0 = time.perf_counter()
        n_model = cf.train_item_cos(r).count()
        t_item = time.perf_counter() - t0
        # exact user-CF is quadratic in raters-per-item (infeasible past
        # ~2000 raters/item); the capped variant is the scale lever.
        t0 = time.perf_counter()
        n_user = cf.train_user_cos(r, max_coraters=500).count()
        t_user = time.perf_counter() - t0
        print(f"mult={mult} ratings={n} item_model_pairs={n_model} "
              f"item_train_s={t_item:.1f} capped_user_pairs={n_user} "
              f"user_train_capped_s={t_user:.1f}", flush=True)


if __name__ == "__main__":
    main()
