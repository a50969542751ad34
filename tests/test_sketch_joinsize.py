"""CMS join-size estimate (functions/sketch.cms_join_size): the
AMS inner-product bound — est >= exact always, tight at generous
width, and cross-sketch estimates match the true equi-join size."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.functions import sketch


def test_cms_join_size_self_join_bound(spark):
    # zipf-ish key frequencies
    rows = [(k,) for k in range(50) for _ in range(1 + (50 - k) // 5)]
    df = spark.createDataFrame(rows, ["k"])
    exact = (df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
             .agg(F.sum(F.col("c") * F.col("c"))).collect()[0][0])
    cms = sketch.cms_build(df, "k", depth=4, width=256)
    est = sketch.cms_join_size(cms, cms).collect()[0]["est_join_size"]
    assert est >= exact
    assert est <= exact * 1.5  # generous width -> few collisions


def test_cms_join_size_two_sided(spark):
    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], ["k"])
    true_size = a.join(b, "k").count()  # 3*1 + 1*2 = 5
    assert true_size == 5
    ca = sketch.cms_build(a, "k", depth=4, width=256)
    cb = sketch.cms_build(b, "k", depth=4, width=256)
    est = sketch.cms_join_size(ca, cb).collect()[0]["est_join_size"]
    assert est == 5  # tiny key set, no collisions at width 256
