"""Property-based invariants for the CF kernels (hypothesis) — beyond
the reference's test strategy (SURVEY §5: it has none)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recdb_postgresql_spark.operators import cf

ratings_strategy = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6),
              st.floats(0.5, 5.0, allow_nan=False)),
    min_size=3, max_size=25, unique_by=lambda t: (t[0], t[1]))


@st.composite
def ratings_tables(draw):
    return draw(ratings_strategy)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_item_cos_invariants(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_cos(r).collect()
    for m in model:
        assert m.item1 < m.item2                      # upper triangle
        assert 0 < m.similarity <= 1.0 + 1e-9         # positive ratings => [0,1]
        assert not math.isnan(m.similarity)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_item_pearson_invariants(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_pearson(r).collect()
    for m in model:
        assert m.item1 < m.item2
        assert m.similarity != 0 and not math.isnan(m.similarity)
        assert -1.0 - 1e-9 <= m.similarity <= 1.0 + 1e-9


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_predict_emits_full_grid(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_cos(r)
    users = r.select("user").distinct()
    items = r.select("item").distinct()
    n_u, n_i = users.count(), items.count()
    scored = cf.predict_item_cf(model, r, users, items)
    assert scored.count() == n_u * n_i                # all pairs, incl. rated
    assert scored.where(cf.F.isnan("score")).count() == 0
