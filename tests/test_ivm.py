"""Incremental rollup maintenance (operators/dml.incremental_rollup)
+ cdc_diff before-images: retract/apply semantics including
group-moving updates and group extinction/birth."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import dml


def _rollup(df):
    return (df.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("v").alias("sum_val")))


def _check(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, ["k", "g", "v"])
    new = spark.createDataFrame(new_rows, ["k", "g", "v"])
    changes = dml.cdc_diff(old, new, ["k"], with_before=True)
    got = dml.incremental_rollup(_rollup(old), changes, ["g"], "v")
    want = _rollup(new)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_ivm_insert_update_delete(spark):
    _check(spark,
           [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
           [(1, "a", 15), (3, "b", 30), (4, "b", 40)])


def test_ivm_update_moves_group(spark):
    _check(spark,
           [(1, "a", 10), (2, "b", 20)],
           [(1, "b", 10), (2, "b", 20)])


def test_ivm_group_extinction_and_birth(spark):
    _check(spark,
           [(1, "a", 10)],
           [(1, "c", 99)])


def test_cdc_before_images(spark):
    old = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                ["k", "g", "v"])
    new = spark.createDataFrame([(1, "a", 15), (3, "c", 30)],
                                ["k", "g", "v"])
    rows = {r["op"]: r for r in
            dml.cdc_diff(old, new, ["k"], with_before=True).collect()}
    assert rows["update"]["_b_v"] == 10 and rows["update"]["v"] == 15
    assert rows["insert"]["_b_v"] is None
    assert rows["delete"]["_b_v"] == 20 and rows["delete"]["v"] == 20
