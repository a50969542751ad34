"""Privacy audits (operators/privacy.py) + data-contract validation
(profile.validate): hand-built violation cases."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import privacy
from recdb_postgresql_spark.operators.profile import validate


def test_k_anonymity_flags_small_classes(spark):
    rows = ([("a", 1)] * 6 + [("a", 2)] * 2 + [(None, 1)] * 3)
    df = spark.createDataFrame(rows, ["zip", "age"])
    out = {(r["zip"], r["age"]): r for r in
           privacy.k_anonymity_audit(df, ["zip", "age"], k=5).collect()}
    assert not out[("a", 1)]["violates"]
    assert out[("a", 2)]["violates"] and out[("a", 2)]["class_size"] == 2
    # NULL quasi-values form their own (flagged) class
    assert out[(None, 1)]["violates"] and out[(None, 1)]["class_size"] == 3


def test_l_diversity_catches_homogeneous_class(spark):
    # class ('a',) is 10 rows but ALL share one sensitive value:
    # k-anonymous at k=5, yet l-diversity(2) must flag it
    rows = ([("a", "flu")] * 10
            + [("b", "flu")] * 3 + [("b", "cold")] * 3)
    df = spark.createDataFrame(rows, ["zip", "dx"])
    kan = {r["zip"]: r for r in
           privacy.k_anonymity_audit(df, ["zip"], k=5).collect()}
    assert not kan["a"]["violates"]
    ldiv = {r["zip"]: r for r in
            privacy.l_diversity_audit(df, ["zip"], "dx", l=2).collect()}
    assert ldiv["a"]["violates"] and ldiv["a"]["n_sensitive"] == 1
    assert not ldiv["b"]["violates"]


def test_generalize_repairs_k_anonymity(spark):
    # ages 30..39 unique -> every class size 1; decade buckets -> 10
    df = spark.createDataFrame([(30 + i,) for i in range(10)], ["age"])
    raw = privacy.k_anonymity_audit(df, ["age"], k=5)
    assert all(r["violates"] for r in raw.collect())
    bucketed = df.select(privacy.generalize(F.col("age"), 10).alias("age"))
    rep = privacy.k_anonymity_audit(bucketed, ["age"], k=5).collect()
    assert len(rep) == 1 and not rep[0]["violates"]
    assert rep[0]["class_size"] == 10


def test_validate_one_pass_counts(spark):
    rows = [(1, 10.0), (2, -5.0), (None, 3.0), (4, 0.0)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {r["rule"]: r for r in validate(df, [
        ("null_id", F.col("id").isNull()),
        ("negative_v", F.col("v") < 0),
        ("never_fires", F.lit(False)),
    ]).collect()}
    assert out["null_id"]["violations"] == 1 and not out["null_id"]["pass"]
    assert out["negative_v"]["violations"] == 1
    assert out["never_fires"]["violations"] == 0 and out["never_fires"]["pass"]
    assert all(r["n_rows"] == 4 for r in out.values())


def test_t_closeness_flags_skewed_class(spark):
    from recdb_postgresql_spark.operators import privacy
    # class "hi" holds only top-of-range values; class "mix" mirrors
    # the global distribution and must score near 0
    rows = ([("mix", float(v % 10)) for v in range(100)]
            + [("hi", 9.0)] * 10 + [("hi", 8.0)] * 10)
    df = spark.createDataFrame(rows, ["qc", "v"])
    out = {r["qc"]: r for r in
           privacy.t_closeness_audit(df, ["qc"], "v", t=0.2,
                                     bins=10).collect()}
    assert out["hi"]["violates"] and out["hi"]["emd"] > 0.3
    assert not out["mix"]["violates"] and out["mix"]["emd"] < 0.1


def test_t_closeness_identical_distribution_zero(spark):
    from recdb_postgresql_spark.operators import privacy
    rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
    df = spark.createDataFrame(rows, ["qc", "v"])
    out = privacy.t_closeness_audit(df, ["qc"], "v", bins=10).collect()
    assert all(r["emd"] == 0.0 and not r["violates"] for r in out)
