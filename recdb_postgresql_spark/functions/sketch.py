"""Count-min sketch as plain DataFrame state: a depth x width counter
matrix — the mergeable, constant-size frequency summary for streams
and shards whose exact per-key counts would be another corpus-sized
shuffle. Complements the built-in sketches already used elsewhere
(HLL++ distinct, KLL quantiles) with the point-frequency one Spark
lacks.

Properties (classic CMS): estimate(k) >= true(k) always; with width w
and depth d, P[estimate - true > 2N/w] < (1/2)^d. Two sketches over
disjoint data UNION + re-sum into the sketch of the union (tested) —
which is what makes this the 100 TB shape: shards sketch locally,
the d x w matrices merge as rows.

Hashing is the portable md5 family, so a SQL oracle reproduces the
sketch bit-for-bit (no RNG, no seeds to ship)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.hashing import md5_long


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 64,
              hash_fn=md5_long, weight_col: str | None = None) -> DataFrame:
    """(j, bucket, cnt): the depth x width counter matrix for the
    values of ``col`` (nulls excluded — a null key has no identity to
    count). One explode-by-row then ONE map-side-combined aggregate;
    the result is at most depth*width rows regardless of input size.

    ``weight_col``: each row counts as that many occurrences — the
    pre-aggregated form. ``cms_build(df, k)`` over raw rows and
    ``cms_build(df.groupBy(k).count(), k, weight_col="count")`` produce
    the IDENTICAL sketch (bucket counters add), but the pre-aggregated
    form hashes each distinct key once instead of once per row — the
    cheap path when a per-key count table already exists upstream.
    Weights must be positive counts for the raw==pre-aggregated
    identity to hold; NULL or non-positive weights are dropped (a raw
    build could never emit their buckets), mirroring the null-key
    exclusion (ADVICE r12)."""
    if weight_col is not None:
        df = df.where(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
    rows = (df.where(F.col(col).isNotNull())
            .select(F.col(col).cast("string").alias("_v"),
                    (F.col(weight_col) if weight_col is not None
                     else F.lit(1)).cast("long").alias("_w"))
            .select("_v", "_w", F.explode(F.sequence(
                F.lit(0), F.lit(depth - 1))).alias("j")))
    bucket = hash_fn(F.concat_ws(":", F.col("j").cast("string"),
                                 F.col("_v"))) % width
    return (rows.select("j", bucket.alias("bucket"), "_w")
            .groupBy("j", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """The sketch of the union of the sketched inputs: counter
    matrices add cell-wise. Same (depth, width, hash_fn) required —
    they are the sketch's identity."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 64,
                 hash_fn=md5_long) -> DataFrame:
    """(key, est): the CMS point estimate min_j counter[j][h_j(key)]
    for each distinct key in ``keys``. The sketch side is tiny
    (broadcast); a bucket no key ever hashed into reads as 0."""
    probes = (keys.select(F.col(key_col))
              .where(F.col(key_col).isNotNull()).distinct()
              .select(key_col, F.col(key_col).cast("string").alias("_v"))
              .select(key_col, "_v", F.explode(F.sequence(
                  F.lit(0), F.lit(depth - 1))).alias("j")))
    bucket = hash_fn(F.concat_ws(":", F.col("j").cast("string"),
                                 F.col("_v"))) % width
    probes = probes.select(key_col, "j", bucket.alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


# ----------------------------------------------------------------------
# HyperLogLog as plain DataFrame state
# ----------------------------------------------------------------------
# Spark's approx_count_distinct runs HLL++ internally but the sketch
# itself never surfaces — it cannot be persisted per-shard, merged
# across days, or diffed. This is the EXPLICIT register table
# (Flajolet et al. 2007): <= m rows of (idx, rho_max), mergeable by
# MAX, estimable from the registers alone. Same portable-md5 contract
# as the CMS above, so a DuckDB oracle reproduces the registers AND
# the estimate bit-for-bit. The 60-bit hash leaves no realistic
# large-range correction regime (2^60 >> any corpus), so only the
# small-range linear-counting correction applies.

_HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_build(df: DataFrame, col: str, b: int = 6,
              hash_fn=md5_long) -> DataFrame:
    """(idx, rho): the 2^b-register HLL sketch of ``col``'s distinct
    values. idx = top b bits of the 60-bit hash, rho = 1 + leading
    zeros of the remaining bits (bit length via bin() — identical
    string semantics on both engines, no float log2). ONE map-side
    combined MAX aggregate; output is <= 2^b rows regardless of
    input size."""
    rest = _HLL_HASH_BITS - b
    h = hash_fn(F.col(col).cast("string"))
    # shiftright, not float division: h spans 60 bits, past double's
    # 53-bit mantissa
    idx = F.shiftright(h, rest)
    w = h % F.lit(1 << rest)
    rho = (F.when(w > 0, F.lit(rest + 1) - F.length(F.bin(w)))
           .otherwise(F.lit(rest + 1)))
    return (df.where(F.col(col).isNotNull())
            .select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """The sketch of the union: registers merge by MAX. Same (b,
    hash_fn) required — they are the sketch's identity."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("idx").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, b: int = 6) -> DataFrame:
    """One row (m, v_zero, est_distinct) from the register table:
    E = alpha_m * m^2 / sum(2^-M_j) over ALL m registers (absent rows
    are zero registers contributing 2^0), with the linear-counting
    small-range correction m*ln(m/V) when E <= 2.5m and V > 0. The
    register spine is a sequence literal — the sketch never leaves
    the category-size class."""
    m = 1 << b
    spark = sketch.sparkSession
    spine = spark.range(m).select(F.col("id").alias("idx"))
    joined = spine.join(F.broadcast(sketch), "idx", "left")
    agg = joined.agg(
        F.sum(F.pow(F.lit(2.0), -F.coalesce(F.col("rho"), F.lit(0))))
         .alias("z"),
        F.count(F.when(F.col("rho").isNull(), 1)).alias("v_zero"))
    e_raw = F.lit(_hll_alpha(m) * m * m) / F.col("z")
    est = (F.when((e_raw <= 2.5 * m) & (F.col("v_zero") > 0),
                  F.lit(float(m)) * F.log(F.lit(float(m))
                                          / F.col("v_zero")))
           .otherwise(e_raw))
    return agg.select(F.lit(m).alias("m"),
                      F.col("v_zero").cast("long").alias("v_zero"),
                      F.round(est, 4).alias("est_distinct"))


def misra_gries(df: DataFrame, key: Column, k: int = 64) -> DataFrame:
    """Misra-Gries heavy-hitters summary: at most ``k`` (key,
    est_count) rows with the classic deterministic guarantee

        true_count - N/(k+1)  <=  est_count  <=  true_count

    so every key with frequency > N/(k+1) is guaranteed present —
    the bounded-memory "top talkers" sketch that completes the
    CMS (point counts) / HLL (distinct) family for streams too wide
    to groupBy. Two-level mergeable-summaries shape (Agarwal et al.
    2012): each partition runs the k-counter MG loop over an Arrow
    batch iterator (state = k counters, one pass, amortized O(1) per
    row), and the <= partitions*k summary rows merge by summing
    per-key and subtracting the (k+1)-th largest merged weight —
    the merge is itself an MG step, so the additive error stays
    <= N/(k+1) end to end.

    Output counts depend on row order within partitions (inherent to
    MG — it is not an order-free aggregate), so callers verify the
    GUARANTEE, not exact values; the repo pins it under adversarial
    orderings in tests.
    """
    import pandas as pd

    kdf = df.select(key.cast("string").alias("mg_key"))

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for x in pdf["mg_key"]:
                if x is None:
                    continue
                if x in counters:
                    counters[x] += 1
                elif len(counters) < k:
                    counters[x] = 1
                else:
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame({"mg_key": list(counters.keys()),
                            "cnt": list(counters.values())})

    summaries = kdf.mapInPandas(summarize, "mg_key string, cnt long")
    merged = (summaries.groupBy("mg_key")
              .agg(F.sum("cnt").alias("cnt")))
    # (k+1)-th largest merged weight (0 when <= k keys survive): the
    # merge-time decrement that keeps the summary size and the
    # additive guarantee (the summary table is tiny — partitions*k)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cnt"), F.col("mg_key"))
    ranked = merged.withColumn("_r", F.row_number().over(w))
    kth = (ranked.where(F.col("_r") == k + 1)
           .select(F.col("cnt").alias("_kth")))
    out = (ranked.join(F.broadcast(kth), how="left")
           .withColumn("est_count",
                       F.col("cnt") - F.coalesce(F.col("_kth"), F.lit(0)))
           .where(F.col("est_count") > 0)
           .select(F.col("mg_key").alias("key"), "est_count"))
    return out


def hll_build_grouped(df: DataFrame, group_col: str, col: str,
                      b: int = 6, hash_fn=md5_long) -> DataFrame:
    """(group, idx, rho): one HLL register table PER GROUP — the
    mergeable per-dimension distinct sketch (distinct users per day /
    per segment / per shard). Rows <= groups * 2^b however big the
    facts; group sketches union across shards/days by MAX, and any
    subset of groups re-estimates without rescanning (the reason to
    sketch per dimension instead of per query)."""
    rest = _HLL_HASH_BITS - b
    h = hash_fn(F.col(col).cast("string"))
    idx = F.shiftright(h, rest)
    w = h % F.lit(1 << rest)
    rho = (F.when(w > 0, F.lit(rest + 1) - F.length(F.bin(w)))
           .otherwise(F.lit(rest + 1)))
    return (df.where(F.col(col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    idx.alias("idx"), rho.alias("rho"))
            .groupBy("grp", "idx").agg(F.max("rho").alias("rho")))


def hll_estimate_grouped(sketch: DataFrame, b: int = 6) -> DataFrame:
    """(grp, m, v_zero, est_distinct) per group from a grouped
    register table — the hll_estimate finisher with the zero-register
    spine crossed per group (groups x 2^b rows, still metadata-
    sized)."""
    m = 1 << b
    groups = sketch.select("grp").distinct()
    spark = sketch.sparkSession
    spine = (groups.crossJoin(
        spark.range(m).select(F.col("id").alias("idx"))))
    joined = spine.join(sketch, ["grp", "idx"], "left")
    agg = joined.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.coalesce(F.col("rho"), F.lit(0))))
         .alias("z"),
        F.count(F.when(F.col("rho").isNull(), 1)).alias("v_zero"))
    e_raw = F.lit(_hll_alpha(m) * m * m) / F.col("z")
    est = (F.when((e_raw <= 2.5 * m) & (F.col("v_zero") > 0),
                  F.lit(float(m)) * F.log(F.lit(float(m))
                                          / F.col("v_zero")))
           .otherwise(e_raw))
    return agg.select("grp", F.lit(m).alias("m"),
                      F.col("v_zero").cast("long").alias("v_zero"),
                      F.round(est, 4).alias("est_distinct"))


def kmv_build_grouped(df: DataFrame, group_col: str, col: str,
                      k: int = 256, hash_fn=md5_long) -> DataFrame:
    """(grp, h): the k SMALLEST distinct hash values of ``col`` per
    group — the KMV / bottom-k sketch (Bar-Yossef et al. 2002;
    ThetaSketch's core). Unlike HLL it supports SET OPERATIONS:
    bottom-k of a union is computable from the two sketches alone,
    which yields intersection and Jaccard estimates no register
    sketch can give. Deterministic (md5 order), so estimates are
    engine-reproducible and oracle-checkable. Rows <= groups * k.
    """
    from pyspark.sql import Window

    w_rank = F.row_number().over(
        Window.partitionBy("grp").orderBy("h"))
    return (df.where(F.col(col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    hash_fn(F.col(col).cast("string")).alias("h"))
            .distinct()
            .withColumn("_r", w_rank)
            .where(F.col("_r") <= k)
            .select("grp", "h"))


def kmv_jaccard_pairs(sketch: DataFrame, k: int = 256) -> DataFrame:
    """(grp1, grp2, est_jaccard): pairwise Jaccard estimates between
    group sketches. For each pair, the k smallest of the UNION of the
    two sketches is the union's own KMV (mergeability); the estimator
    is the fraction of those bottom-k present in BOTH sketches —
    unbiased for |A∩B|/|A∪B| (the standard KMV intersection trick).
    All counting, one self-join keyed on the hash value: sketch-sized
    work however large the underlying sets."""
    from pyspark.sql import Window

    pairs = (sketch.select(F.col("grp").alias("grp1")).distinct()
             .join(sketch.select(F.col("grp").alias("grp2")).distinct(),
                   F.col("grp1") < F.col("grp2")))
    a = sketch.select(F.col("grp").alias("grp1"), "h")
    b = sketch.select(F.col("grp").alias("grp2"), "h")
    # union of the two sketches per pair, flagged by membership
    ua = pairs.join(a, "grp1").select("grp1", "grp2", "h",
                                      F.lit(1).alias("in_a"),
                                      F.lit(0).alias("in_b"))
    ub = pairs.join(b, "grp2").select("grp1", "grp2", "h",
                                      F.lit(0).alias("in_a"),
                                      F.lit(1).alias("in_b"))
    merged = (ua.unionByName(ub)
              .groupBy("grp1", "grp2", "h")
              .agg(F.max("in_a").alias("in_a"),
                   F.max("in_b").alias("in_b")))
    w = Window.partitionBy("grp1", "grp2").orderBy("h")
    topk = (merged.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k))
    return (topk.groupBy("grp1", "grp2")
            .agg(F.count(F.lit(1)).alias("kk"),
                 F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
                 .alias("both"))
            .select("grp1", "grp2",
                    (F.col("both") / F.col("kk")).alias("est_jaccard"))
            .orderBy("grp1", "grp2"))


# ----------------------------------------------------------------------
# DDSketch-style mergeable quantile sketch (integer-exact buckets)
# ----------------------------------------------------------------------

def ddq_build(df: DataFrame, col: str, scale: int = 1_000_000,
              sub_bits: int = 3) -> DataFrame:
    """(shift, sub, cnt): a DDSketch-style relative-error quantile
    sketch (Masson, Lee, Rim — VLDB 2019) for a NON-NEGATIVE value
    column — the mergeable quantile summary that completes the
    explicit-sketch family (CMS counts / HLL distincts / MG heavy
    hitters / KMV set ops). Spark's built-in ``approx_percentile``
    carries a KLL sketch internally but cannot EXPORT it, so per-shard
    or per-day summaries can't be stored and merged later; this one is
    a plain DataFrame.

    Bucketing is DDSketch's log layout with base 2^(1/2^sub_bits),
    computed with INTEGER BIT TRICKS instead of float log (the same
    move as HLL's bin()-length rho, so a SQL oracle reproduces the
    sketch bit-for-bit): the value is quantized to ``q =
    round(v*scale)``, its octave is the bit length of q, and the top
    ``sub_bits+1`` bits of q are the sub-bucket. A bucket's bounds are
    [sub << shift, (sub+1) << shift); with sub >= 2^sub_bits the width
    is at most lb/2^sub_bits, so the midpoint estimate has relative
    error <= 2^-(sub_bits+1) (6.25% at the default) plus the 1/scale
    quantization term. Values below 2^(sub_bits+1) quantized units get
    shift=0 singleton buckets — EXACT at the tail where relative
    buckets would be coarsest.

    Bucket count is bounded by ~(64 - sub_bits) * 2^sub_bits (< 512)
    however large the input: one map-side-combined aggregate, shards
    sketch locally, sketches merge by summing cnt."""
    q = F.round(F.col(col).cast("double") * F.lit(float(scale)), 0) \
         .cast("long")
    lvl = F.length(F.bin(q))  # bit length of q; bin(0) = '0' -> 1
    shift = F.greatest(lvl - F.lit(sub_bits + 1), F.lit(0)) \
             .cast("int")
    # python-side F.shiftright insists on a literal bit count; the SQL
    # function takes column operands
    return (df.where(F.col(col).isNotNull() & (F.col(col) >= 0))
            .select(q.alias("_q"), shift.alias("shift"))
            .select("shift",
                    F.expr("shiftright(_q, shift)").alias("sub"))
            .groupBy("shift", "sub")
            .agg(F.count(F.lit(1)).alias("cnt")))


def ddq_merge(*sketches: DataFrame) -> DataFrame:
    """Sum-merge: the sketch of a union of shards is the row-wise sum
    of the shard sketches (cnt is additive per bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("shift", "sub").agg(F.sum("cnt").alias("cnt"))


def ddq_quantiles(sketch: DataFrame, ps, scale: int = 1_000_000) -> DataFrame:
    """(p, rank, est_value) for each requested quantile p: the
    midpoint of the bucket holding rank ceil(p*N) in bucket order.
    Bucket order IS numeric order of the lower bound sub << shift
    (monotone in the original value), so one cumulative window over
    the <512-row bucket table — sketch-sized work, single task by
    design — answers every p at once. Midpoints are exact binary
    fractions of integers, so estimates are bit-reproducible in any
    engine."""
    from pyspark.sql import Window

    lb = F.expr("shiftleft(sub, shift)")
    ub = F.expr("shiftleft(sub + 1, shift)")
    w = Window.orderBy(lb)
    b = (sketch
         .withColumn("mid", (lb + ub) / F.lit(2.0) / F.lit(float(scale)))
         .withColumn("cum", F.sum("cnt").over(
             w.rowsBetween(Window.unboundedPreceding, 0)))
         .withColumn("total", F.sum("cnt").over(
             w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))))
    spark = sketch.sparkSession
    pdf = spark.createDataFrame([(float(p),) for p in ps], ["p"])
    r = F.ceil(F.col("p") * F.col("total")).cast("long")
    return (pdf.crossJoin(b)
            .where(F.col("cum") >= F.greatest(r, F.lit(1)))
            .groupBy("p")
            .agg(F.min_by(F.col("mid"), F.col("cum")).alias("est_value"),
                 F.greatest(F.min(r), F.lit(1)).alias("rank"))
            .select("p", "rank", "est_value"))


def ddq_build_grouped(df: DataFrame, group_col: str, col: str,
                      scale: int = 1_000_000,
                      sub_bits: int = 3) -> DataFrame:
    """(grp, shift, sub, cnt): one DDQ bucket table PER GROUP — the
    per-dimension quantile state (p99 latency per endpoint/day/shard)
    that ``approx_percentile``'s unexportable internal sketch can't
    give. Rows <= groups x ~512; group sketches merge by cnt-SUM and
    any group subset re-estimates without rescanning facts."""
    q = F.round(F.col(col).cast("double") * F.lit(float(scale)), 0) \
         .cast("long")
    lvl = F.length(F.bin(q))
    shift = F.greatest(lvl - F.lit(sub_bits + 1), F.lit(0)).cast("int")
    return (df.where(F.col(col).isNotNull() & (F.col(col) >= 0))
            .select(F.col(group_col).alias("grp"), q.alias("_q"),
                    shift.alias("shift"))
            .select("grp", "shift",
                    F.expr("shiftright(_q, shift)").alias("sub"))
            .groupBy("grp", "shift", "sub")
            .agg(F.count(F.lit(1)).alias("cnt")))


def ddq_quantiles_grouped(sketch: DataFrame, ps,
                          scale: int = 1_000_000) -> DataFrame:
    """(grp, p, rank, est_value): ddq_quantiles per group — one
    cumulative window PARTITIONED by group over the sketch rows;
    every group's p-estimates answer in one pass over
    groups x buckets rows."""
    from pyspark.sql import Window

    lb = F.expr("shiftleft(sub, shift)")
    ub = F.expr("shiftleft(sub + 1, shift)")
    w = Window.partitionBy("grp").orderBy(lb)
    b = (sketch
         .withColumn("mid", (lb + ub) / F.lit(2.0) / F.lit(float(scale)))
         .withColumn("cum", F.sum("cnt").over(
             w.rowsBetween(Window.unboundedPreceding, 0)))
         .withColumn("total", F.sum("cnt").over(
             w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))))
    spark = sketch.sparkSession
    pdf = spark.createDataFrame([(float(p),) for p in ps], ["p"])
    r = F.ceil(F.col("p") * F.col("total")).cast("long")
    return (b.join(F.broadcast(pdf))
            .where(F.col("cum") >= F.greatest(r, F.lit(1)))
            .groupBy("grp", "p")
            .agg(F.min_by(F.col("mid"), F.col("cum")).alias("est_value"),
                 F.greatest(F.min(r), F.lit(1)).alias("rank"))
            .select("grp", "p", "rank", "est_value"))


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """One row (est_join_size): the equi-join cardinality estimate
    from two CMS counter matrices — the classic AMS/CMS inner-product
    result (Alon-Matias-Szegedy 1996; Cormode-Muthukrishnan 2005):
    |A ⋈_k B| = sum_k f_A(k)·f_B(k), and each CMS row j's
    bucket-wise inner product sum_b c_Aj[b]·c_Bj[b] OVERESTIMATES it
    by hash-collision mass, so min over the d rows is the estimate
    (always >= truth, within 2·N_A·N_B/width with probability
    1-2^-d). This answers "how big would this join be" from two
    d x w matrices — join PLANNING without executing the join, the
    sketch the skew/salting decision wants before committing a
    shuffle. Same (depth, width, hash_fn) required on both sides.

    Pure integer arithmetic over sketch-sized rows: one bucket-keyed
    equi-join of <= d*w rows per side, one d-row aggregate, one MIN."""
    a = cms_a.select("j", "bucket", F.col("cnt").alias("ca"))
    b = cms_b.select("j", "bucket", F.col("cnt").alias("cb"))
    per_row = (a.join(b, ["j", "bucket"])
               .groupBy("j")
               .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip")))
    return per_row.agg(F.min("ip").alias("est_join_size"))
