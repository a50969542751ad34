"""FD audit (operators/profile.fd_audit): g3 semantics on a
constructed violation, the holds contract, and NULL grouping."""

from recdb_postgresql_spark.operators import profile


def test_fd_g3_counts_minimum_deletions(spark):
    # det=1 maps to dep a,a,b (majority a -> delete 1 row);
    # det=2 maps to dep c (clean)
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    row = profile.fd_audit(df, [("k->v", ["k"], "v")]).collect()[0]
    assert row["n_rows"] == 4 and row["n_groups"] == 2
    assert row["violating_groups"] == 1 and row["g3_rows"] == 1
    assert not row["holds"] and row["confidence"] == 0.75


def test_fd_holds_and_composite_determinant(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (2, 1, "x")], ["a", "b", "v"])
    row = profile.fd_audit(df, [("ab->v", ["a", "b"], "v")]).collect()[0]
    assert row["holds"] and row["g3_rows"] == 0 \
        and row["confidence"] == 1.0


def test_fd_null_dependent_groups_as_value(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, "z")], ["k", "v"])
    row = profile.fd_audit(df, [("k->v", ["k"], "v")]).collect()[0]
    assert row["holds"]


def test_impute_group_median_semantics(spark):
    from pyspark.sql import functions as F
    rows = [("a", 1.0), ("a", 3.0), ("a", None),
            ("b", None), ("b", None),  # all-null group -> global
            ("c", 10.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = profile.impute_group_median(df, "g", "v").collect()
    got = sorted((r["g"], r["v"], r["was_imputed"]) for r in out)
    # group a median = 2.0; global median of (1,3,10) = 3.0
    assert ("a", 2.0, True) in got
    assert ("b", 3.0, True) in got
    assert ("c", 10.0, False) in got
    assert sum(1 for _, _, i in got if i) == 3
