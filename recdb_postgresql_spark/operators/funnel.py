"""Event-sequence analytics: ordered funnels and cohort retention.

The product-analytics surface every events pipeline grows
(Amplitude/Mixpanel-style): "how many users did A, then B strictly
after, then C strictly after that", and "of the users whose first
activity fell in period P, how many were active in P+k". Both are
built as single-pass keyed aggregations — no per-step re-scan of the
event log — and both are exactly reproducible in SQL (the oracle
computes the funnel with chained sequential CTEs, a different
evaluation strategy, so the check is semantic).

The reference has no event-sequence operators (SURVEY.md §1.4: no
streams/time-series); this is a pipeline extension (§2.3 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_depth(events: DataFrame, steps: list[str],
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts",
                      order_col: str = "event_id") -> DataFrame:
    """(user, step_ts[1..N], depth): per-user strictly-ordered funnel —
    step_ts[i] is the EARLIEST timestamp of step i that falls strictly
    after step_ts[i-1] (the standard first-touch funnel chain); depth
    is how many steps the user completed.

    Scale shape: ONE shuffle (groupBy user). Each user's relevant
    events (only types in ``steps`` — filtered before the shuffle)
    are sorted into an array and folded left-to-right: ascending order
    means the first event that can legally extend the chain is the
    minimal one, so one linear pass computes all N chain timestamps —
    the N-sequential-aggregates formulation (the oracle's shape) would
    rescan the log N times. Per-user state is the filtered event list:
    bounded by that user's funnel-step events, the documented hot-key
    consideration (cap with a per-(user, type) time-bucket min
    pre-aggregate if one user owns the stream)."""
    n = len(steps)
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))])
    ev = (events.where(F.col(type_col).isin(steps))
          .select(F.col(user_col).alias("user"),
                  F.struct(F.col(ts_col).cast("long").alias("tsn"),
                           F.col(order_col).cast("long").alias("ord"),
                           step_idx[F.col(type_col)].alias("si"))
                  .alias("e")))
    init = F.array(*[F.lit(None).cast("long") for _ in range(n)])
    folded = (ev.groupBy("user")
              .agg(F.array_sort(F.collect_list("e")).alias("_evs"))
              .select(
                  "user",
                  F.aggregate(
                      F.col("_evs"), init,
                      lambda st, e: F.transform(
                          st,
                          lambda x, i: F.coalesce(
                              x,
                              F.when((i == e.getField("si"))
                                     & ((i == F.lit(0))
                                        | (e.getField("tsn")
                                           > F.get(st, i - 1))),
                                     e.getField("tsn"))))).alias("chain")))
    cols = [F.get(F.col("chain"), i).alias(f"ts_{i + 1}") for i in range(n)]
    depth = F.size(F.filter(F.col("chain"), lambda x: x.isNotNull()))
    return folded.select("user", *cols, depth.cast("int").alias("depth"))


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """(step_idx, step, n_users): how many users reached each funnel
    step (strictly-ordered chain). The per-user pass is one shuffle;
    this reduction is |steps| rows."""
    d = funnel_user_depth(events, steps, user_col, type_col, ts_col)
    counts = d.groupBy("depth").agg(F.count(F.lit(1)).alias("_n"))
    # users at depth >= i reached step i: suffix-sum the depth
    # histogram (|steps|² join on an already-tiny frame, instead of
    # exploding |users| x depth rows)
    idx = counts.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx int, step string")
    # left join + coalesce: a step nobody reached must still report 0
    return (idx.join(counts, counts["depth"] >= idx["step_idx"], "left")
            .groupBy("step_idx", "step")
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
                 .alias("n_users"))
            .select("step_idx", "step", "n_users"))


def cohort_retention(events: DataFrame, period_ns: int,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_period, period_offset, n_users): classic retention
    triangle — users are cohorted by the period of their FIRST
    activity; each (cohort, offset) cell counts users from that cohort
    active ``offset`` periods later.

    Scale shape: distinct (user, period) first — collapses arbitrarily
    hot users to one row per period BEFORE any window — then one
    per-user window min and one final aggregate. Nothing holds a
    user's raw history."""
    # integer div, NOT float-divide-then-truncate: int64 nanos exceed
    # double's 53-bit mantissa, so float division would mis-bucket
    # boundary timestamps.
    act = (events.select(F.col(user_col).alias("user"),
                         F.expr(f"CAST({ts_col} AS LONG) div "
                                f"{int(period_ns)}").alias("p"))
           .distinct())
    w = Window.partitionBy("user")
    return (act.withColumn("p0", F.min("p").over(w))
            .groupBy(F.col("p0").alias("cohort_period"),
                     (F.col("p") - F.col("p0")).alias("period_offset"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


def last_touch_attribution(events: DataFrame,
                           conversion_type: str = "purchase",
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           order_col: str = "event_id") -> DataFrame:
    """(conversion_id, user, conv_ts, attributed_type, attributed_ts):
    last-touch attribution — each conversion event is credited to the
    user's most recent PRECEDING non-conversion event (the marketing
    "which touchpoint closed the sale" query). Conversions with no
    prior touch keep NULL attribution (counted, not dropped — audits
    need the unattributed mass).

    Scale shape: ONE keyed window (last-ignorenulls carry over rows
    BETWEEN unbounded AND 1 preceding) — the same carry-forward idiom
    as ``asof_join``, so the same hot-key bound and the same
    time-bucketed fix apply."""
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).cast("long"), F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col(type_col) != conversion_type,
                   F.struct(F.col(type_col).alias("t"),
                            F.col(ts_col).cast("long").alias("tsn")))
    carried = events.withColumn("_lt", F.last(touch, ignorenulls=True).over(w))
    return (carried.where(F.col(type_col) == conversion_type)
            .select(F.col(order_col).alias("conversion_id"),
                    F.col(user_col).alias("user"),
                    F.col(ts_col).cast("long").alias("conv_ts"),
                    F.col("_lt.t").alias("attributed_type"),
                    F.col("_lt.tsn").alias("attributed_ts")))


def funnel_user_depth_multipass(events: DataFrame, steps: list[str],
                                user_col: str = "user_id",
                                type_col: str = "event_type",
                                ts_col: str = "ts") -> DataFrame:
    """Skew-safe variant of ``funnel_user_depth`` (same output
    contract): N chained min-aggregates instead of one per-user
    sorted-array fold. The fold holds a hot user's entire filtered
    history in ONE task's memory and sorts it there; this variant's
    per-step shape is a map-side-combined min aggregate plus an
    id-keyed join — the aggregate never skews (partial combine) and
    the join is exactly what AQE's skew-split can break up. Price: N
    passes over the (pre-filtered) event stream — the oracle's
    evaluation strategy, promoted to the production path when one key
    owns the stream. Parity with the fold is pinned in
    tests/test_funnel.py and asserted in the stress probe."""
    ev = (events.where(F.col(type_col).isin(steps))
          .select(F.col(user_col).alias("user"), F.col(type_col).alias("t"),
                  F.col(ts_col).cast("long").alias("tsn")))
    base = ev.select("user").distinct()
    cur = (ev.where(F.col("t") == steps[0]).groupBy("user")
           .agg(F.min("tsn").alias("ts_1")))
    for i in range(1, len(steps)):
        prev, this = f"ts_{i}", f"ts_{i + 1}"
        nxt = (ev.where(F.col("t") == steps[i])
               .join(cur, "user")
               .where(F.col("tsn") > F.col(prev))
               .groupBy("user")
               .agg(F.min("tsn").alias(this)))
        cur = cur.join(nxt.select("user", this), "user", "left")
    out = base.join(cur, "user", "left")
    chain = F.array(*[F.col(f"ts_{i + 1}") for i in range(len(steps))])
    depth = F.size(F.filter(chain, lambda x: x.isNotNull()))
    return out.select("user",
                      *[F.col(f"ts_{i + 1}") for i in range(len(steps))],
                      depth.cast("int").alias("depth"))


DAY_NS = 86_400_000_000_000


def kaplan_meier(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts",
                 churn_window_ns: int = 7 * DAY_NS,
                 day_ns: int = DAY_NS) -> DataFrame:
    """(t_days, n_risk, n_churned, survival): Kaplan-Meier survival
    curve for user lifetime with right-censoring — the estimator
    ``cohort_retention`` is NOT: users still active at the end of the
    observation window are censored (they contribute to the risk set
    up to their observed lifetime) instead of counted as churned, so
    the curve is unbiased when the window is short relative to
    lifetimes (Kaplan & Meier 1958).

    Definitions: a user CHURNS if their last event is more than
    ``churn_window_ns`` before the corpus max timestamp; lifetime =
    floor((last_seen - first_seen) / day) days for churned users,
    censored lifetimes run to the observation end. S(t) =
    prod_{t_i <= t} (1 - d_i / n_i) computed as EXP of the running
    SUM of LN terms — the sequential-accumulation window-aggregate
    shape whose cross-engine float parity this build has pinned since
    the EWMA/seasonal operators, so the whole curve is oracle-checked.

    Scale: one per-user min/max aggregate, one single-row broadcast
    (corpus max ts), one duration-keyed count aggregate (rows =
    distinct lifetimes, never users), two ordered windows over that
    tiny frame. Nothing is user-quadratic."""
    from pyspark.sql import Window

    ev = events.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("tsn")) \
        .where(F.col("u").isNotNull() & F.col("tsn").isNotNull())
    tmax = ev.agg(F.max("tsn").alias("tmax"))
    spans = ev.groupBy("u").agg(F.min("tsn").alias("first_ts"),
                                F.max("tsn").alias("last_ts"))
    churned = (F.col("last_ts")
               <= F.col("tmax") - F.lit(int(churn_window_ns)))
    end_ts = F.when(churned, F.col("last_ts")).otherwise(F.col("tmax"))
    marked = (spans.crossJoin(F.broadcast(tmax))
              .select(F.when(churned, 1).otherwise(0).alias("churned"),
                      F.floor((end_ts - F.col("first_ts"))
                              / F.lit(float(day_ns)))
                      .cast("long").alias("t_days")))
    per_t = marked.groupBy("t_days").agg(
        F.sum("churned").cast("long").alias("n_churned"),
        F.count(F.lit(1)).alias("cnt"))
    w_risk = (Window.orderBy("t_days")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    w_cum = (Window.orderBy("t_days")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    at_risk = per_t.withColumn(
        "n_risk", F.sum("cnt").over(w_risk).cast("long"))
    term = F.log(F.greatest(
        F.lit(1.0) - F.col("n_churned").cast("double")
        / F.col("n_risk").cast("double"),
        F.lit(1e-300)))
    return (at_risk
            .select("t_days", "n_risk", "n_churned",
                    F.round(F.exp(F.sum(term).over(w_cum)), 6)
                    .alias("survival"))
            .orderBy("t_days"))


def multi_touch_attribution(events: DataFrame,
                            conversion_type: str = "purchase",
                            half_life_ns: int = DAY_NS,
                            window_ns: int = 7 * DAY_NS,
                            user_col: str = "user_id",
                            type_col: str = "event_type",
                            ts_col: str = "ts",
                            order_col: str = "event_id") -> DataFrame:
    """(channel, n_touches, n_conversions, total_credit): TIME-DECAY
    multi-touch attribution — where ``last_touch_attribution`` gives
    the closing touchpoint 100% of the credit, this splits each
    conversion's single unit of credit across ALL its preceding
    touches inside ``window_ns``, weighted by recency:
    w = 2^((t_touch - t_conv) / half_life) (a touch half a life older
    gets sqrt(2)x less), normalized per conversion so every converted
    user contributes exactly 1.0 regardless of how chatty their
    journey was. Strictly-before semantics (t_touch < t_conv) — a
    same-instant event can't cause the conversion.

    Scale shape: ONE equi-join on the user key (touches x conversions
    within a user), filtered to the window — per-user cost is
    touch_u x conv_u, the same per-key quadratic class as
    interval_join, bounded by journey length; a degenerate
    all-events-one-user key wants the same time-bucket split as the
    hot-key as-of. Then one per-conversion window sum (normalize) and
    one channel aggregate. POWER(2, dt/hl) on exact int64-nanos
    deltas is the decay expression with pinned cross-engine parity
    (the half-life CF oracle uses it verbatim)."""
    base = events.select(F.col(user_col).alias("u"),
                         F.col(type_col).alias("t"),
                         F.col(ts_col).cast("long").alias("tsn"),
                         F.col(order_col).alias("oid"))
    conv = base.where(F.col("t") == conversion_type) \
        .select("u", F.col("tsn").alias("conv_ts"),
                F.col("oid").alias("conv_id"))
    touch = base.where(F.col("t") != conversion_type) \
        .select("u", F.col("t").alias("channel"),
                F.col("tsn").alias("touch_ts"))
    pairs = (touch.join(conv, "u")
             .where((F.col("touch_ts") < F.col("conv_ts"))
                    & (F.col("touch_ts")
                       >= F.col("conv_ts") - F.lit(int(window_ns))))
             .select("channel", "conv_id",
                     F.pow(F.lit(2.0),
                           (F.col("touch_ts") - F.col("conv_ts"))
                           .cast("double")
                           / F.lit(float(half_life_ns))).alias("w")))
    w_conv = Window.partitionBy("conv_id")
    credited = pairs.select(
        "channel", "conv_id",
        (F.col("w") / F.sum("w").over(w_conv)).alias("credit"))
    return (credited.groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
                 F.countDistinct("conv_id").cast("long")
                 .alias("n_conversions"),
                 F.round(F.sum("credit"), 6).alias("total_credit")))


def cohort_ltv(events: DataFrame, period_ns: int,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """(cohort, age, cohort_size, period_revenue, cum_revenue_per_user):
    cohort lifetime-value curve — the revenue companion to
    ``cohort_retention``: users grouped by first-seen period, revenue
    accumulated by cohort age, normalized per cohort member so curves
    compare across cohort sizes (the 'has monetization improved for
    newer cohorts' chart).

    Ages with no revenue still appear (zero period_revenue, flat
    cumulative) so every cohort's curve is dense from age 0 to the
    observation edge — gaps would read as chart artifacts. Scale
    shape: one per-user window min (first period), one
    (cohort, age) aggregate, a cohort-sized dense spine
    (sequence/explode over max observed age), one ordered cumulative
    window over the TRIANGLE-sized frame (#cohorts x #ages, never
    events)."""
    # integer div, NOT floor(double division): nanos exceed 2^53 and
    # the double path mis-buckets boundary timestamps (readers.py
    # contract — ts is int64 nanos)
    base = (events.select(F.col(user_col).alias("u"),
                          F.expr(f"CAST({ts_col} AS BIGINT) "
                                 f"div {int(period_ns)}").alias("p"),
                          F.coalesce(F.col(value_col).cast("double"),
                                     F.lit(0.0)).alias("v"))
            .where(F.col("u").isNotNull()))
    w_u = Window.partitionBy("u")
    aged = base.withColumn("cohort", F.min("p").over(w_u)) \
        .withColumn("age", (F.col("p") - F.col("cohort")).cast("long"))
    rev = aged.groupBy("cohort", "age").agg(F.sum("v").alias("rev"))
    size = (aged.select("cohort", "u").distinct()
            .groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size")))
    max_age = aged.agg(F.max(F.col("p")).alias("maxp"))
    spine = (size.crossJoin(F.broadcast(max_age))
             .select("cohort", "cohort_size",
                     F.explode(F.sequence(
                         F.lit(0).cast("long"),
                         F.col("maxp") - F.col("cohort"))).alias("age")))
    w_cum = (Window.partitionBy("cohort").orderBy("age")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = (spine.join(rev, ["cohort", "age"], "left")
              .select("cohort", "age", "cohort_size",
                      F.coalesce("rev", F.lit(0.0)).alias("rev")))
    return (joined.select(
        "cohort", "age",
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round("rev", 6).alias("period_revenue"),
        F.round(F.sum("rev").over(w_cum)
                / F.col("cohort_size").cast("double"), 6)
        .alias("cum_revenue_per_user")))


def top_session_paths(events: DataFrame, gap_ns: int = 1800 * 10 ** 9,
                      k: int = 10, max_len: int = 8,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """(path, n_sessions): the ``k`` most common session journeys —
    each session's time-ordered event-type sequence (gap-based
    sessions, first ``max_len`` steps), counted across all sessions.
    The "what do users actually do" view the funnel's fixed step list
    can't give.

    Shape: the session id is the standard lag + running-sum window
    (per-user sort, the sessionize contract); each session collapses
    to ONE path string via a sorted in-group array (state = session
    length, truncated at ``max_len``); path counting is a plain
    aggregate on strings and top-k is TakeOrdered. Ties break by
    path for determinism."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(prev.isNull()
                      | (F.col(ts_col) - prev > gap_ns), 1).otherwise(0)
    sess = (events.withColumn("_new", new_sess)
            .withColumn("_sess", F.sum("_new").over(w)))
    paths = (sess.groupBy(user_col, "_sess")
             .agg(F.array_join(
                 F.slice(F.transform(
                     F.sort_array(F.collect_list(F.struct(
                         F.col(ts_col).alias("t"),
                         F.col(id_col).alias("i"),
                         F.col(type_col).alias("e")))),
                     lambda s: s["e"]), 1, max_len), ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path").limit(k))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts",
                       id_col: str = "event_id") -> DataFrame:
    """(from_state, to_state, n, p): the first-order Markov chain of
    user behavior — transition counts and row-normalized
    probabilities between consecutive events per user, with a
    synthetic ``_start`` state before each user's first event (so
    entry-point mass is part of the same matrix). The
    behavioral-modeling summary behind next-action prediction and
    the top_session_paths mining here.

    One lag window per user (ordered by (ts, id) — the id tiebreak
    makes simultaneous events deterministic), one states²-bounded
    aggregate, one broadcast row-total join; p is an exact integer
    ratio. State space is the event-type vocabulary, so the matrix
    is metadata-sized at any fact scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (events
             .where(F.col(user_col).isNotNull()
                    & F.col(type_col).isNotNull())
             .select(F.coalesce(F.lag(type_col).over(w),
                                F.lit("_start")).alias("from_state"),
                     F.col(type_col).alias("to_state")))
    cnt = (pairs.groupBy("from_state", "to_state")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("from_state").agg(F.sum("n").alias("_t"))
    return (cnt.join(F.broadcast(tot), "from_state")
            .select("from_state", "to_state", "n",
                    F.round(F.col("n") / F.col("_t"), 6).alias("p"))
            .orderBy("from_state", "to_state"))


def rfm_segments(events: DataFrame, n_tiles: int = 5,
                 user_col: str = "user_id", ts_col: str = "ts",
                 val_col: str = "value") -> DataFrame:
    """(user, recency_days, frequency, monetary, r, f, m, segment):
    classic RFM segmentation — per-user recency (days since last
    event, measured from the corpus max so the readout is
    reproducible), frequency (event count) and monetary (value sum,
    1e-6-quantized so it's exact), each cut into ``n_tiles`` ntiles
    (5 = the conventional 555-is-best coding; r is REVERSED so
    fresher = higher). ``segment`` concatenates the three digits.

    One user-level aggregate (map-side combined) + three global ntile
    windows over USER rows with full deterministic tie-breaks
    (metric, then user id) — at 100 TB pre-bin the metrics to a grid
    or swap the ntile for ddq_quantiles cut points; the per-user
    aggregate is the only fact-scan cost either way."""
    from pyspark.sql import Window

    DAY_NS = 86400 * 10 ** 9
    mx = events.agg(F.max(ts_col).alias("_mx"))
    per = (events.where(F.col(user_col).isNotNull())
           .crossJoin(F.broadcast(mx))
           .groupBy(F.col(user_col).alias("user_id"))
           .agg(F.min(F.col("_mx") - F.col(ts_col)).alias("_rns"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum(F.round(F.col(val_col) * 1e6, 0).cast("long"))
                .alias("_mq")))
    # ntiles order on the exact INTEGER metrics; the readable
    # recency_days/monetary doubles are derived afterwards
    r = F.ntile(n_tiles).over(
        Window.orderBy(F.col("_rns").desc(), "user_id"))
    f = F.ntile(n_tiles).over(
        Window.orderBy(F.col("frequency"), "user_id"))
    m = F.ntile(n_tiles).over(Window.orderBy(F.col("_mq"), "user_id"))
    return (per.withColumn("r", r).withColumn("f", f).withColumn("m", m)
            .select("user_id",
                    F.round(F.col("_rns") / F.lit(float(DAY_NS)), 6)
                    .alias("recency_days"), "frequency",
                    F.round(F.col("_mq") / 1e6, 6).alias("monetary"),
                    "r", "f", "m",
                    F.concat(F.col("r").cast("string"),
                             F.col("f").cast("string"),
                             F.col("m").cast("string")).alias("segment"))
            .orderBy("user_id"))


def markov_attribution(events: DataFrame, channels,
                       conv_type: str = "purchase",
                       k_rounds: int = 24, scale: int = 10 ** 9,
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts",
                       id_col: str = "event_id") -> DataFrame:
    """(channel, p_conv, p_removed, removal_effect, attribution):
    Markov removal-effect attribution (the data-driven multi-touch
    model: Anderl et al. 2014) — build the first-order journey chain
    (markov_transitions semantics, journeys truncated at first
    conversion, per-state END mass implicit in the occurrence
    denominators), make the conversion state absorbing, and price
    each channel by how much conversion probability DISAPPEARS when
    transitions into it are severed. Position/decay attribution
    (the operators beside this) assume credit shapes; removal effect
    derives them from the observed graph.

    Exactness: transition probabilities quantize to ``scale``
    integer units with integer half-up rounding, and the truncated
    absorption runs ``k_rounds`` of INTEGER matrix-vector rounds
    (v' = sum(v*Mq) // scale; total mass <= scale bounds every sum
    below 2^63) — so a SQL oracle unrolling the same rounds matches
    bit-for-bit. The iteration itself is driver-local over the
    states²-sized matrix (the PAV/BPE metadata pattern); the facts
    contribute two aggregates (transition counts, occurrence
    counts)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = (events.where(F.col(user_col).isNotNull()
                        & F.col(type_col).isNotNull())
           .withColumn("_rn", F.row_number().over(w)))
    fc = (seq.where(F.col(type_col) == conv_type)
          .groupBy(user_col).agg(F.min("_rn").alias("_fc")))
    trunc = (seq.join(fc, user_col, "left")
             .where(F.col("_fc").isNull() | (F.col("_rn") <= F.col("_fc"))))
    pairs = trunc.select(
        F.coalesce(F.lag(type_col).over(
            Window.partitionBy(user_col).orderBy("_rn")),
            F.lit("_start")).alias("f"),
        F.col(type_col).alias("t"))
    t_counts = {(r["f"], r["t"]): r["n"] for r in
                pairs.groupBy("f", "t")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    occ = {r["s"]: r["n"] for r in
           trunc.groupBy(F.col(type_col).alias("s"))
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    occ["_start"] = trunc.select(user_col).distinct().count()

    # integer half-up quantized transition matrix; conv absorbing
    mq: dict[tuple[str, str], int] = {}
    for (f, t), n in t_counts.items():
        if f == conv_type:
            continue
        d = occ[f]
        mq[(f, t)] = (n * scale * 2 + d) // (2 * d)
    mq[(conv_type, conv_type)] = scale

    def absorb(blocked: str | None) -> int:
        v = {"_start": scale}
        for _ in range(k_rounds):
            nv: dict[str, int] = {}
            for (f, t), q in mq.items():
                if blocked is not None and t == blocked:
                    continue
                if f in v and v[f] > 0:
                    nv[t] = nv.get(t, 0) + v[f] * q
            v = {s: m // scale for s, m in nv.items()}
        return v.get(conv_type, 0)

    p_full = absorb(None)
    rows = []
    removed = {c: absorb(c) for c in channels}
    tot_re = sum(max(p_full - p, 0) for p in removed.values())
    # raw integer-ratio doubles, never Python round(): round-half-
    # EVEN would diverge from the oracle's ROUND; every value below
    # is one correctly-rounded division of exact ints, so it is
    # bit-identical in any engine computing the same ratio
    for c in channels:
        re = (1.0 - removed[c] / p_full) if p_full > 0 else None
        attr = (max(p_full - removed[c], 0) / tot_re
                if tot_re > 0 else None)
        rows.append((c, p_full / scale, removed[c] / scale, re, attr))
    spark = events.sparkSession
    return spark.createDataFrame(
        rows, "channel string, p_conv double, p_removed double, "
              "removal_effect double, attribution double") \
        .orderBy("channel")


def nelson_aalen(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts",
                 churn_window_ns: int = 7 * DAY_NS,
                 day_ns: int = DAY_NS) -> DataFrame:
    """(t_days, n_risk, n_churned, cum_hazard, survival_fh):
    Nelson-Aalen cumulative hazard H(t) = sum_{t_i<=t} d_i/n_i over
    the same censored lifetimes as ``kaplan_meier``, plus the
    Fleming-Harrington survival exp(-H) — the hazard-scale sibling
    (H is additive, so hazards DIFFERENCE cleanly between cohorts
    where KM curves only ratio). Same scale shape as KM: duration-
    keyed aggregates and two ordered windows over distinct-lifetime
    rows; each hazard increment is an exact integer ratio."""
    from pyspark.sql import Window

    ev = events.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("tsn")) \
        .where(F.col("u").isNotNull() & F.col("tsn").isNotNull())
    tmax = ev.agg(F.max("tsn").alias("tmax"))
    spans = ev.groupBy("u").agg(F.min("tsn").alias("first_ts"),
                                F.max("tsn").alias("last_ts"))
    churned = (F.col("last_ts")
               <= F.col("tmax") - F.lit(int(churn_window_ns)))
    end_ts = F.when(churned, F.col("last_ts")).otherwise(F.col("tmax"))
    marked = (spans.crossJoin(F.broadcast(tmax))
              .select(F.when(churned, 1).otherwise(0).alias("churned"),
                      F.floor((end_ts - F.col("first_ts"))
                              / F.lit(float(day_ns)))
                      .cast("long").alias("t_days")))
    per_t = marked.groupBy("t_days").agg(
        F.sum("churned").cast("long").alias("n_churned"),
        F.count(F.lit(1)).alias("cnt"))
    w_risk = (Window.orderBy("t_days")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    w_cum = (Window.orderBy("t_days")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    at_risk = per_t.withColumn(
        "n_risk", F.sum("cnt").over(w_risk).cast("long"))
    inc = F.col("n_churned") / F.col("n_risk")
    haz = F.sum(inc).over(w_cum)
    return (at_risk
            .select("t_days", "n_risk", "n_churned",
                    F.round(haz, 6).alias("cum_hazard"),
                    F.round(F.exp(-haz), 6).alias("survival_fh"))
            .orderBy("t_days"))


def logrank_test(events: DataFrame, group, user_col: str = "user_id",
                 ts_col: str = "ts",
                 churn_window_ns: int = 7 * DAY_NS,
                 day_ns: int = DAY_NS) -> DataFrame:
    """One row (n_a, n_b, obs_a, exp_a, z, chi2): the log-rank test —
    do two cohorts share a survival curve? At each event time the
    observed group-A churns compare against the hypergeometric
    expectation d * nA/n given the risk sets; z = sum(O-E)/sqrt(sum V)
    (Mantel 1966) — the inferential companion KM/Nelson-Aalen plots
    lack. ``group`` is a boolean Column over the events row: TRUE =
    cohort A (evaluated per user via MAX — a user's cohort must be
    constant).

    Per-time contributions are exact integer ratios quantized to
    1e-12 before summing (partitioning-invariant, oracle-exact); work
    is the KM shape per group plus one distinct-lifetime-sized
    pivot."""
    from pyspark.sql import Window

    ev = events.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("tsn"),
                       group.cast("int").alias("g")) \
        .where(F.col("u").isNotNull() & F.col("tsn").isNotNull())
    tmax = ev.agg(F.max("tsn").alias("tmax"))
    spans = ev.groupBy("u").agg(F.min("tsn").alias("first_ts"),
                                F.max("tsn").alias("last_ts"),
                                F.max("g").alias("g"))
    churned = (F.col("last_ts")
               <= F.col("tmax") - F.lit(int(churn_window_ns)))
    end_ts = F.when(churned, F.col("last_ts")).otherwise(F.col("tmax"))
    marked = (spans.crossJoin(F.broadcast(tmax))
              .select("g",
                      F.when(churned, 1).otherwise(0).alias("churned"),
                      F.floor((end_ts - F.col("first_ts"))
                              / F.lit(float(day_ns)))
                      .cast("long").alias("t_days")))
    per = marked.groupBy("t_days").agg(
        F.sum(F.when(F.col("g") == 1, F.col("churned"))).cast("long")
         .alias("d_a"),
        F.sum("churned").cast("long").alias("d"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long")
         .alias("c_a"),
        F.count(F.lit(1)).alias("c"))
    w_risk = (Window.orderBy("t_days")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    risk = (per
            .withColumn("n_r", F.sum("c").over(w_risk).cast("long"))
            .withColumn("na_r", F.sum("c_a").over(w_risk).cast("long"))
            .where(F.col("d") > 0))
    n, na, d, da = (F.col("n_r").cast("double"),
                    F.col("na_r").cast("double"),
                    F.col("d").cast("double"), F.col("d_a"))
    e_a = d * na / n
    v = F.when(n > 1,
               d * (na / n) * ((n - na) / n) * (n - d) / (n - F.lit(1.0))
               ).otherwise(F.lit(0.0))
    q = F.lit(1e12)
    agg = risk.agg(
        F.sum("d_a").alias("obs_a"),
        F.sum(F.round(e_a * q, 0).cast("long")).alias("ea_q"),
        F.sum(F.round(v * q, 0).cast("long")).alias("v_q"))
    sizes = marked.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long")
         .alias("n_a"),
        F.count(F.lit(1)).alias("n_tot"))
    z = F.try_divide(F.col("obs_a") - F.col("ea_q") / q,
                     F.sqrt(F.col("v_q") / q))
    return (agg.crossJoin(F.broadcast(sizes))
            .select("n_a", (F.col("n_tot") - F.col("n_a")).alias("n_b"),
                    "obs_a",
                    F.round(F.col("ea_q") / q, 6).alias("exp_a"),
                    F.round(z, 6).alias("z"),
                    F.round(z * z, 6).alias("chi2")))
