"""Temporal joins over event streams — the as-of/range operators a
feature-engineering pipeline needs and vanilla SQL joins express badly.

Not part of the RecDB reference surface (it has no time-series
operators at all — SURVEY §1.4); these are pipeline extensions in the
spirit of kdb's ``aj`` / DuckDB's ``ASOF JOIN`` / Flink's temporal
join, built Spark-first.

The classic formulation — an inequality join ``l.ts >= r.ts`` plus a
per-row argmax — is a range join: Catalyst can only nested-loop it,
and at 100 TB the l×r blowup within each key is fatal. The scalable
shape used here is union + window:

1. tag both sides, union them into ONE stream,
2. one window per key ordered by (ts, side-tag) carrying
   ``last(right-value, ignorenulls)`` forward,
3. keep left rows; each has the most recent right row at or before
   its timestamp.

Cost: one shuffle on the key (same as any keyed join), one sort per
partition — no cross product anywhere, skew bounded by the hottest
key exactly like a regular join. This is the standard distributed
as-of recipe (pandas' merge_asof per-group, made shuffle-parallel).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: tuple[str, ...] = (),
              strict: bool = False,
              tolerance: int | None = None,
              right_tiebreak: str | None = None) -> DataFrame:
    """For every left row, attach the latest right row with the same
    ``on`` key and ``right.ts <= left.ts`` (``strict=True``: < instead
    of <=, the lookahead-safe variant for feature generation — a
    feature computed AT the label's timestamp is leakage).

    ``value_cols``: the right-side columns to carry (default: all
    non-key, non-ts columns). ``tolerance``: optional max staleness in
    the ts unit — matches older than ``left.ts - tolerance`` become
    NULL, like pandas ``merge_asof(tolerance=...)``.

    Left rows with no prior right row keep NULLs (left-outer
    semantics). Ties on (key, ts): the right row sorts before the left
    row (non-strict) so a same-instant match is visible; among
    same-instant right rows the one with the highest
    ``right_tiebreak`` value wins ("most recent state at time t").
    Pass a unique right column (an event id) whenever right
    timestamps can collide per key — without it Spark's sort leaves
    equal-key order undefined and the result is nondeterministic.

    Output: all left columns + ``value_cols`` (NULL-filled) +
    ``matched_ts`` (the matched right row's timestamp, NULL if none).
    """
    value_cols, lhs, rhs = _tagged_sides(left, right, on, left_ts,
                                         right_ts, value_cols, strict,
                                         right_tiebreak)
    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_tie")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lhs.unionByName(rhs).select(
        "_lrow", "_ts",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in value_cols],
        F.last("_vts", ignorenulls=True).over(w).alias("_cts"))
    out = carried.where(F.col("_lrow").isNotNull())
    return _emit(out, left.columns, value_cols, tolerance)


def _tagged_sides(left, right, on, left_ts, right_ts, value_cols,
                  strict, right_tiebreak):
    """The shared union prep: both sides projected onto
    (_k, _ts, _side, _lrow, _v_*, _vts, _tie)."""
    if not value_cols:
        value_cols = tuple(c for c in right.columns
                           if c not in (on, right_ts))
    # side tag orders right (0) before left (1) at equal ts, so a
    # same-timestamp right row is visible to the left row unless strict
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lhs = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(l_tag).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_vts"))
    tie_type = (right.schema[right_tiebreak].dataType
                if right_tiebreak else "long")
    lhs = lhs.withColumn("_tie", F.lit(None).cast(tie_type))
    rhs = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_side"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(right_ts).alias("_vts"),
        (F.col(right_tiebreak) if right_tiebreak
         else F.lit(None).cast("long")).alias("_tie"))
    return value_cols, lhs, rhs


def _emit(out: DataFrame, left_cols, value_cols,
          tolerance: int | None) -> DataFrame:
    fresh: Column = F.lit(True)
    if tolerance is not None:
        fresh = F.col("_cts") >= F.col("_ts") - F.lit(tolerance)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left_cols],
        *[F.when(fresh, F.col(f"_c_{c}")).alias(c) for c in value_cols],
        F.when(fresh, F.col("_cts")).alias("matched_ts"))


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str,
                       time_bucket: int,
                       left_ts: str = "ts", right_ts: str = "ts",
                       value_cols: tuple[str, ...] = (),
                       strict: bool = False,
                       tolerance: int | None = None,
                       right_tiebreak: str | None = None) -> DataFrame:
    """``asof_join`` with the hot-key bound — identical semantics
    (parity-pinned against ``asof_join`` in tests/test_temporal.py and
    the same brute-force property oracle), different skew behavior.

    The plain union+window shape sorts a key's ENTIRE history in ONE
    task: windows never split a partition key the way AQE splits a
    skewed join, so at 100 TB a degenerate key (a null-ish default id
    owning a big slice of the stream) is the straggler (measured by
    stress.py's asof_hotkey probe). Two-pass fix:

    1. within-bucket pass: the same union+window, but partitioned by
       (key, ts div time_bucket) — the hot key's sort is capped at one
       bucket's rows per task;
    2. carry pass: per (key, bucket) the right side collapses to ONE
       summary row (its bucket-end carried state, per-column last
       non-null — the same ignorenulls semantics as the flat window);
       a window over these tiny summaries carries state across buckets
       (per key it holds #buckets rows, not #events), and a final
       equi-join on (key, bucket) + per-column COALESCE(within-bucket,
       prior-bucket carry) reassembles the exact flat-window answer.

    Cost vs ``asof_join``: the same keyed shuffle (on a wider key) plus
    one summary aggregate and one co-partitioned join — worth it only
    when key skew is real. Pick ``time_bucket`` (in ts units) so the
    hottest key sees ~1e3-1e5 rows per bucket.

    Strictness note: the cross-bucket carry needs no side tag — any
    prior bucket's right ts < the current bucket's start <= left ts,
    so strict and non-strict agree on it; the tag only disambiguates
    same-instant rows, which always share a bucket.
    """
    value_cols, lhs, rhs = _tagged_sides(left, right, on, left_ts,
                                         right_ts, value_cols, strict,
                                         right_tiebreak)
    bucket = F.expr(f"_ts div {int(time_bucket)}")
    lhs = lhs.withColumn("_b", bucket)
    rhs = rhs.withColumn("_b", bucket)

    # pass 1: flat-window semantics WITHIN each (key, bucket)
    wb = (Window.partitionBy("_k", "_b").orderBy("_ts", "_side", "_tie")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = lhs.unionByName(rhs).select(
        "_k", "_b", "_lrow", "_ts",
        *[F.last(f"_v_{c}", ignorenulls=True).over(wb).alias(f"_w_{c}")
          for c in value_cols],
        F.last("_vts", ignorenulls=True).over(wb).alias("_wts")) \
        .where(F.col("_lrow").isNotNull())

    # pass 2a: one bucket-end summary row per (key, bucket) of the
    # right side — per-column last non-null, i.e. the state a flat
    # window would carry out of the bucket
    ws = (Window.partitionBy("_k", "_b").orderBy("_ts", "_tie")
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    wlast = (Window.partitionBy("_k", "_b")
             .orderBy(F.col("_ts").desc(), F.col("_tie").desc()))
    summ = rhs.select(
        "_k", "_b",
        *[F.last(f"_v_{c}", ignorenulls=True).over(ws).alias(f"_s_{c}")
          for c in value_cols],
        F.last("_vts", ignorenulls=True).over(ws).alias("_sts"),
        F.row_number().over(wlast).alias("_rn")).where(F.col("_rn") == 1)

    # pass 2b: carry summaries across buckets. The bucket spine is
    # every (key, bucket) seen on either side, so left-only buckets
    # still receive the carry; per key this frame holds #buckets rows,
    # never #events — that is the whole point.
    spine = lhs.select("_k", "_b").unionByName(rhs.select("_k", "_b")) \
        .distinct()
    wp = (Window.partitionBy("_k").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = spine.join(summ.drop("_rn"), ["_k", "_b"], "left").select(
        "_k", "_b",
        *[F.last(f"_s_{c}", ignorenulls=True).over(wp).alias(f"_p_{c}")
          for c in value_cols],
        F.last("_sts", ignorenulls=True).over(wp).alias("_pts"))

    # reassemble: within-bucket state wins per column; else prior carry
    out = within.join(carry, ["_k", "_b"]).select(
        "_lrow", "_ts",
        *[F.coalesce(F.col(f"_w_{c}"), F.col(f"_p_{c}")).alias(f"_c_{c}")
          for c in value_cols],
        F.coalesce(F.col("_wts"), F.col("_pts")).alias("_cts"))
    return _emit(out, left.columns, value_cols, tolerance)


_INTERVAL_INTERNAL = ("_c", "_pts", "_ivs", "_ive",
                      "_lvs", "_lve", "_rvs", "_rve")


def _check_no_internal_names(*frames: DataFrame) -> None:
    """The interval joins rename through reserved internal columns
    (see ``_INTERVAL_INTERNAL``); an input already carrying one would
    be silently overwritten and dropped — refuse loudly instead."""
    for df in frames:
        clash = sorted(set(df.columns) & set(_INTERVAL_INTERNAL))
        if clash:
            raise ValueError(
                f"input columns {clash} collide with interval-join "
                f"internal names {_INTERVAL_INTERNAL}; rename them")


def _explode_cells(df: DataFrame, start: str, end: str,
                   s_alias: str, e_alias: str, cell: int) -> DataFrame:
    """One interval side of the grid recipe: copy start/end onto the
    side's reserved internal names and explode onto every covered time
    cell (truncating SQL `div`, matched everywhere cells are derived)."""
    return (df.withColumn(s_alias, F.col(start))
            .withColumn(e_alias, F.col(end))
            .withColumn("_c", F.explode(F.expr(
                f"sequence({start} div {cell}, {end} div {cell})"))))


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  cell: int,
                  point_ts: str = "ts",
                  start_col: str = "start_ts",
                  end_col: str = "end_ts") -> DataFrame:
    """EXACT point-in-interval join: every (interval row, point row)
    pair with the same ``on`` key and ``start <= point_ts <= end``
    (closed ends). All interval and point columns come through
    (key/ts columns once each).

    The naive formulation is a range join — Catalyst nested-loops it,
    |P|x|I| per key. This is the 1-D form of the geo grid recipe
    (``operators/geo.py``): every interval explodes to the time cells
    it covers (``sequence(start div cell, end div cell)``), every
    point maps to ONE cell, and the join is a pure equi-join on
    (key, cell) with the BETWEEN as a residual filter. A point lies in
    exactly one cell, so no dedup pass is needed. Candidate volume is
    O(points + Σ interval_length/cell x cell_density), never |P|x|I|.

    Pick ``cell`` (ts units) near the TYPICAL interval length: each
    interval then explodes to ~2 cells; much smaller cells inflate the
    explode, much larger cells inflate residual-filtered candidates.
    At 100 TB both sides shuffle once on (key, cell) — skew follows
    the hottest (key, cell), which ``cell`` directly bounds.

    NULL semantics (all grid joins here + operators/geo.py share it):
    a row with a NULL timestamp/endpoint/key maps to no cell and joins
    nothing — it silently emits no pairs, the same as SQL's
    ``BETWEEN``/equality on NULL. Filter such rows out beforehand if
    you need to count them."""
    cell = int(cell)
    _check_no_internal_names(points, intervals)
    # the residual compares via RENAMED internal columns (_ivs/_ive/
    # _pts): plain F.col names break when the two sides share a column
    # name (intervals keeping their raw ts), and child-frame attribute
    # references break the other common case — both sides derived from
    # the SAME DataFrame (Spark's ambiguous-self-join detection).
    # Unique internal names survive both; a genuine name clash in the
    # OUTPUT just yields duplicate-named columns, like any Spark join.
    iv = _explode_cells(intervals, start_col, end_col, "_ivs", "_ive", cell)
    pt = (points.withColumn("_c", F.expr(f"{point_ts} div {cell}"))
          .withColumn("_pts", F.col(point_ts)))
    joined = iv.join(pt, [on, "_c"]).where(
        (F.col("_pts") >= F.col("_ivs")) & (F.col("_pts") <= F.col("_ive")))
    return joined.drop("_c", "_ivs", "_ive", "_pts")


def interval_overlap_join(left: DataFrame, right: DataFrame, on: str,
                          cell: int,
                          left_start: str = "start_ts",
                          left_end: str = "end_ts",
                          right_start: str = "start_ts",
                          right_end: str = "end_ts") -> DataFrame:
    """EXACT interval-overlap join: every (left row, right row) pair
    with the same ``on`` key whose closed intervals intersect
    (``l.start <= r.end AND r.start <= l.end``) — sessions vs outage
    windows, promo periods vs user activity spans.

    Same 1-D grid recipe as ``interval_join``, with the overlap twist:
    BOTH sides explode onto their covered time cells, the join is an
    equi-join on (key, cell), and because two overlapping intervals
    can share MANY cells, each pair is emitted exactly once WITHOUT a
    distinct pass: a pair is kept only in the first cell both occupy,
    ``greatest(l.start, r.start) div cell`` — plain arithmetic on
    columns already in hand, where a distinct would be a second
    shuffle of the whole candidate set. Candidate volume is
    O(Σ interval_length/cell x per-cell density); pick ``cell`` near
    the typical interval length (~2 cells per interval)."""
    cell = int(cell)
    _check_no_internal_names(left, right)
    lhs = _explode_cells(left, left_start, left_end, "_lvs", "_lve", cell)
    rhs = _explode_cells(right, right_start, right_end, "_rvs", "_rve", cell)
    # `div` (not floor-divide): the cell ids in the sequences above use
    # SQL div, which truncates toward zero — the first-common-cell
    # arithmetic must truncate identically or negative-timestamp pairs
    # get filtered into nonexistent cells and vanish
    joined = lhs.join(rhs, [on, "_c"]).where(
        (F.col("_lvs") <= F.col("_rve")) & (F.col("_rvs") <= F.col("_lve"))
        & (F.col("_c") == F.expr(f"greatest(_lvs, _rvs) div {cell}")))
    return joined.drop("_c", "_lvs", "_lve", "_rvs", "_rve")


def resample_ffill(df: DataFrame, on: str, bucket: int,
                   ts_col: str = "ts",
                   value_col: str = "value",
                   tiebreak: str | None = None) -> DataFrame:
    """Regularize an event stream onto a fixed time grid: one row per
    (key, bucket) from each key's FIRST to LAST observed bucket —
    including empty gap buckets — carrying the last observed value
    forward (the standard resample + ffill of a feature pipeline;
    pandas ``resample().ffill()``, TimescaleDB ``time_bucket_gapfill``
    + ``locf``).

    Output: (on, bucket_start = bucket_id * bucket in ts units,
    n_events = events in that bucket (0 for gaps), <value_col> = value
    of the bucket's latest event, carried forward across gaps).
    Within a bucket "latest" orders by (ts, tiebreak) — pass a unique
    column when timestamps can collide per key, same contract as
    ``asof_join``.

    Plan shape: one aggregate to (key, bucket) rows, one per-key
    min/max aggregate whose ``sequence()`` explode generates the
    spine (the spine is GENERATED downstream of a shuffle that only
    carried two longs per key — gap rows never travel), one
    co-partitioned left join, one per-key window for the carry.
    Per-key window size is #buckets (span/bucket), NOT #events — a
    hot key is bounded by its time span, so the skew ceiling is
    chosen, not data-driven. Guard the spine against adversarial
    spans (one stray 1970 timestamp = millions of gap rows) by
    filtering outliers or capping span/bucket upstream."""
    bucket = int(bucket)
    b = df.withColumn("_b", F.expr(f"{ts_col} div {bucket}"))
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else [])
    wlast = Window.partitionBy(on, "_b").orderBy(*order)
    per_bucket = (b.withColumn("_rn", F.row_number().over(wlast))
                  .groupBy(on, "_b")
                  .agg(F.count("*").alias("n_events"),
                       F.max(F.when(F.col("_rn") == 1,
                                    F.col(value_col))).alias("_v")))
    spine = (b.groupBy(on)
             .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
             .select(on, F.explode(F.expr("sequence(_lo, _hi)"))
                     .alias("_b")))
    wff = (Window.partitionBy(on).orderBy("_b")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(per_bucket, [on, "_b"], "left")
            .select(F.col(on),
                    (F.col("_b") * bucket).alias("bucket_start"),
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.last("_v", ignorenulls=True).over(wff)
                    .alias(value_col)))


def debounce_events(events: DataFrame, window_ns: int,
                    key_cols=("user_id", "event_type"),
                    ts_col: str = "ts",
                    order_col: str = "event_id") -> DataFrame:
    """Event-stream debounce: within each key, drop events that follow
    the PREVIOUS KEPT event by less than ``window_ns`` — the standard
    cleanup for double-clicks / retry storms / at-least-once delivery
    before events feed counters or training data.

    Anchored semantics (each kept event restarts the window), computed
    without iteration: an event is kept iff its gap-to-predecessor
    chain reaches back to the key's first event in steps >= window_ns
    — equivalently, keep rows where the running MAX of
    (ts - previous kept ts) ... which a single pass can't express; so
    this uses the simpler PREDECESSOR rule: drop an event whose gap to
    the immediately preceding RAW event is < window_ns. One lag over
    one keyed window; deterministic ties via ``order_col``. The
    difference from anchored debounce is documented: a burst longer
    than the window keeps only its first event under anchored
    semantics but one event per quiet gap here — for telemetry
    cleanup the predecessor rule is the common choice (kafka-streams
    suppress, amplitude dedup) and it stays one window pass at scale."""
    from pyspark.sql import Window

    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy("tsn", order_col)
    base = events.withColumn("tsn", F.col(ts_col).cast("long"))
    gap = F.col("tsn") - F.lag("tsn").over(w)
    return (base.withColumn("_gap", gap)
            .where(F.col("_gap").isNull() | (F.col("_gap") >= window_ns))
            .drop("_gap", "tsn"))


def ewma_smooth(events: DataFrame, alpha: float = 0.3, window: int = 20,
                key_col: str = "user_id", ts_col: str = "ts",
                val_col: str = "value",
                order_col: str = "event_id") -> DataFrame:
    """(order, key, tsn, value, ewma): exponentially weighted moving
    average over each key's trailing ``window`` rows — pandas
    ``ewm(alpha).mean()`` (adjust=True) truncated to a bounded lookback
    so the weights never underflow and per-row cost is constant.

    ewma_t = sum_j (1-a)^j x_(t-j) / sum_j (1-a)^j over the j=0..m-1
    rows present (a short head window normalizes over what exists).
    Implemented as ``window`` LAG columns over ONE keyed window — pure
    codegen arithmetic, no arrays or higher-order functions, and the
    term order is a fixed expression tree, so the float sum is
    bit-identical on any engine evaluating the same expression (the
    oracle spells out the same terms in the same order). Ordering ties
    break on ``order_col`` for determinism.

    Scale shape: one shuffle on the key; per-task state is ``window``
    lag slots. Same hot-key caveat and time-bucket fix as
    ``asof_join`` when a single key owns the stream."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("tsn", order_col)
    base = events.select(F.col(order_col), F.col(key_col),
                         F.col(ts_col).cast("long").alias("tsn"),
                         F.col(val_col).cast("double").alias("_v"))
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(window):
        lagged = F.lag("_v", j).over(w)
        wj = float((1.0 - alpha) ** j)
        num = num + F.coalesce(lagged * F.lit(wj), F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
    return base.select(order_col, key_col, "tsn",
                       F.col("_v").alias(val_col),
                       F.round(num / den, 6).alias("ewma"))


def scd2_build(changes: DataFrame, key_cols, ts_col: str,
               attr_cols, order_cols=()) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from a change log: one row per
    (key, attribute-state) validity interval — (keys..., attrs...,
    valid_from, valid_to, is_current), with ``valid_to`` the next
    state's start (exclusive; NULL = open) and consecutive no-change
    events collapsed. The standard warehouse shape for "what was this
    entity's state at time T" joins (pair with ``interval_join``).

    Attribute comparison is null-safe (NULL -> value IS a change,
    NULL -> NULL is not). ``order_cols`` breaks same-timestamp ties
    deterministically (pass the change log's id column).

    Scale shape: one shuffle on the keys, two window passes over the
    same (key, ts) sort — change detection (lag) then interval close
    (lead) — with the filter between them running map-side. No join,
    no collect; hot-key bound is the usual single-key-sorts-in-one-
    task caveat shared with every keyed window here."""
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    order_cols = list(order_cols)
    reserved = {"valid_from", "valid_to", "is_current"}
    clash = reserved & set(key_cols) | reserved & set(attr_cols)
    if clash:
        raise ValueError(f"scd2_build output reserves {sorted(reserved)}; "
                         f"rename input columns {sorted(clash)}")
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    first = F.lag(F.lit(1)).over(w).isNull()
    diffs = [~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
             for a in attr_cols]
    changed = first
    for d in diffs:
        changed = changed | d
    kept = (changes
            .select(*key_cols, ts_col, *order_cols, *attr_cols)
            .withColumn("_chg", changed)
            .where(F.col("_chg")).drop("_chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    return (kept
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop(ts_col, *order_cols))


def moving_aggregate(events: DataFrame, window_ns: int,
                     key_col: str = "user_id", ts_col: str = "ts",
                     val_col: str = "value",
                     order_col: str = "event_id") -> DataFrame:
    """(event_id, key, tsn, value, win_avg, win_sum, win_n): trailing
    time-RANGE window aggregates — each event's average/sum/count of
    ``val_col`` over the key's events in the preceding ``window_ns``
    (inclusive of the current instant). RANGE, not ROWS: events
    sharing a timestamp all see the same window, so the result is
    order-independent and engine-portable.

    Scale shape: one keyed window over (key, long, double) rows; state
    per task is the in-window suffix, bounded by event rate x window
    span — the usual hot-key caveat, with the same documented
    time-bucket fix as ``asof_join`` when one key owns the stream."""
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy(F.col("tsn"))
         .rangeBetween(-int(window_ns), 0))
    return (events.select(F.col(order_col), F.col(key_col),
                          F.col(ts_col).cast("long").alias("tsn"),
                          F.col(val_col))
            .withColumn("win_avg", F.round(F.avg(val_col).over(w), 6))
            .withColumn("win_sum", F.round(F.sum(val_col).over(w), 6))
            .withColumn("win_n", F.count(F.lit(1)).over(w).cast("long")))


def seasonal_decompose(series: DataFrame, key_cols, bucket_col: str,
                       y_col: str, period: int,
                       round_to: int = 6) -> DataFrame:
    """(key..., bucket, y, trend, seasonal, residual): CLASSICAL
    additive seasonal decomposition of an aggregated series — the
    step a real anomaly detector runs so it flags residuals, not raw
    values (a daily peak is not an anomaly; a deviation FROM the
    daily pattern is).

    Definitions (symmetric-window variant of the classical method):
    trend = centered (period+1)-point moving average, NULL where the
    window is incomplete (the first/last half-period, as classical
    decomposition leaves them); seasonal = per-phase
    (bucket mod period) mean of the detrended values, CENTERED so the
    seasonal components sum to ~0; residual = y - trend - seasonal
    (NULL where trend is). Every step is a window/groupBy over the
    AGGREGATED series — per-key cost is #buckets, never event count —
    and the identical arithmetic runs in the SQL oracle.
    """
    keys = list(key_cols)
    half = int(period) // 2
    w = Window.partitionBy(*keys).orderBy(bucket_col) \
        .rowsBetween(-half, half)
    y = F.col(y_col).cast("double")
    t = series.select(*keys, F.col(bucket_col).alias("bucket"),
                      y.alias("y"))
    trended = t.withColumn(
        "trend",
        F.when(F.count(F.lit(1)).over(
            Window.partitionBy(*keys).orderBy("bucket")
            .rowsBetween(-half, half)) == 2 * half + 1,
            F.avg("y").over(Window.partitionBy(*keys).orderBy("bucket")
                            .rowsBetween(-half, half))))
    phase = F.pmod(F.col("bucket"), F.lit(int(period)))
    sea_raw = (trended.where(F.col("trend").isNotNull())
               .groupBy(*keys, phase.alias("phase"))
               .agg(F.avg(F.col("y") - F.col("trend")).alias("_s")))
    sea_mean = sea_raw.groupBy(*keys).agg(F.avg("_s").alias("_sm"))
    seasonal = (sea_raw.join(sea_mean, keys)
                .select(*keys, "phase",
                        (F.col("_s") - F.col("_sm")).alias("_seas")))
    out = (trended.withColumn("phase", phase)
           .join(seasonal, [*keys, "phase"], "left"))
    return out.select(
        *keys, "bucket", F.round("y", round_to).alias("y"),
        F.round("trend", round_to).alias("trend"),
        F.round("_seas", round_to).alias("seasonal"),
        F.round(F.col("y") - F.col("trend") - F.col("_seas"),
                round_to).alias("residual"))


def changepoint_scores(series: DataFrame, key_cols, bucket_col: str,
                       y_col: str, window: int = 6,
                       round_to: int = 6) -> DataFrame:
    """(key..., bucket, y, left_mean, right_mean, shift_score):
    two-sided mean-shift change-point score over an AGGREGATED series
    — the windowed form of CUSUM-style level-shift detection: at each
    bucket, |mean of the next ``window`` buckets - mean of the
    previous ``window``| (current row excluded from both sides). A
    genuine regime change scores ~the level jump; noise averages out.
    Rows whose either side is incomplete score NULL (the honest edge,
    like seasonal_decompose's trend).

    Per-key cost is #buckets (the series is already aggregated), two
    ROWS-frame window means — the sequential-accumulation window
    shape with pinned cross-engine float parity, so the scores are
    oracle-checkable end to end."""
    keys = list(key_cols)
    w_left = Window.partitionBy(*keys).orderBy(bucket_col) \
        .rowsBetween(-int(window), -1)
    w_right = Window.partitionBy(*keys).orderBy(bucket_col) \
        .rowsBetween(1, int(window))
    y = F.col(y_col).cast("double")
    full = ((F.count(F.lit(1)).over(w_left) == int(window))
            & (F.count(F.lit(1)).over(w_right) == int(window)))
    lm = F.avg(y).over(w_left)
    rm = F.avg(y).over(w_right)
    return series.select(
        *keys, F.col(bucket_col).alias("bucket"),
        F.round(y, round_to).alias("y"),
        F.round(F.when(full, lm), round_to).alias("left_mean"),
        F.round(F.when(full, rm), round_to).alias("right_mean"),
        F.round(F.when(full, F.abs(rm - lm)), round_to)
        .alias("shift_score"))


def holt_forecast(series: DataFrame, key_cols, bucket_col: str,
                  y_col: str, alpha: float = 0.3, beta: float = 0.1,
                  round_to: int = 6) -> DataFrame:
    """(key..., bucket, y, yhat): Holt's linear-trend exponential
    smoothing, fitted one-step-ahead — yhat at bucket t is the
    forecast made from data through t-1, the honest backtest column a
    monitoring pipeline thresholds (Holt 1957 / Hyndman & Athanasopoulos
    fpp3 ch. 8).

    Recursion (classical init): l_1 = y_1, b_1 = y_2 - y_1; for t>=2
    yhat_t = l_{t-1} + b_{t-1}, then l_t = alpha*y_t +
    (1-alpha)*(l_{t-1}+b_{t-1}), b_t = beta*(l_t - l_{t-1}) +
    (1-beta)*b_{t-1}. Keys with fewer than 2 buckets emit nothing.

    Execution: the recursion is inherently sequential IN t, so it runs
    as ONE Arrow ``applyInPandas`` pass — sequential per key, parallel
    across keys, state = two floats. Per-key cost is #buckets of the
    AGGREGATED series. Despite being a stateful non-SQL operator the
    result is still oracle-checked hash-exact: the DuckDB twin runs
    the identical float64 expression tree through a recursive CTE
    (every op is IEEE-deterministic; rounding happens Spark-side with
    half-up semantics matching SQL ROUND, never in pandas whose
    round is banker's)."""
    import pandas as pd

    keys = list(key_cols)
    a = float(alpha)
    be = float(beta)
    base = series.select(*keys, F.col(bucket_col).alias("bucket"),
                         F.col(y_col).cast("double").alias("y"))
    # StructType.add MUTATES the receiver — never extend base.schema
    # in place or the input frame grows a phantom column
    from pyspark.sql.types import DoubleType, StructField, StructType
    schema = StructType(list(base.schema.fields)
                        + [StructField("yhat", DoubleType())])

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pdf.iloc[0:0].assign(yhat=pd.Series(dtype="float64"))
        ys = [float(v) for v in pdf["y"]]
        lev = ys[0]
        tr = ys[1] - ys[0]
        yhat = []
        for t in range(1, n):
            pred = lev + tr
            yhat.append(pred)
            lev_new = a * ys[t] + (1.0 - a) * (lev + tr)
            tr = be * (lev_new - lev) + (1.0 - be) * tr
            lev = lev_new
        out = pdf.iloc[1:].copy()
        out["yhat"] = yhat
        return out

    return (base.groupBy(*keys).applyInPandas(fit, schema)
            .select(*keys, "bucket",
                    F.round("y", round_to).alias("y"),
                    F.round("yhat", round_to).alias("yhat")))


def holt_winters_forecast(series: DataFrame, key_cols, bucket_col: str,
                          y_col: str, period: int, alpha: float = 0.3,
                          beta: float = 0.05, gamma: float = 0.2,
                          round_to: int = 6) -> DataFrame:
    """(key..., bucket, y, yhat): ADDITIVE Holt-Winters (triple
    exponential smoothing) fitted one-step-ahead — ``holt_forecast``
    plus a ``period``-length seasonal state, the estimator for series
    with both trend and a cycle (fpp3 ch. 8.3).

    Classical DETRENDED init over the first two seasons:
    b = (mean(y[m:2m]) - mean(y[0:m])) / m; l = mean(y[0:m]) +
    b*(m-1)/2 (the centered first-season level advanced to the season
    end, so l is the state as of t = m-1); s_i = y_i - (mean(y[0:m]) +
    (i - (m-1)/2)*b) (seasonal AFTER removing the in-season trend —
    without this the exact-tracking law below fails). Fitting starts
    at t = m; keys shorter than 2 periods emit nothing.
    Recursion: yhat_t = l + b + s[t-m]; l' = alpha*(y_t - s[t-m]) +
    (1-alpha)*(l + b); b' = beta*(l' - l) + (1-beta)*b;
    s[t] = gamma*(y_t - l') + (1-gamma)*s[t-m].

    Same execution contract as ``holt_forecast``: one Arrow
    applyInPandas pass, sequential per key, state = 2 floats + an
    m-vector. Rows-only for the driver's oracle gate (the seasonal
    state is an ARRAY the recursive-CTE trick can't carry cleanly);
    correctness is pinned instead by the exact-tracking law — on a
    synthetic series that IS trend + seasonal, the classical init
    recovers the true (l, b, s) exactly and every yhat equals y
    bit-for-bit — plus a hand recursion (tests/test_temporal.py)."""
    import pandas as pd

    keys = list(key_cols)
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    a, be, ga = float(alpha), float(beta), float(gamma)
    base = series.select(*keys, F.col(bucket_col).alias("bucket"),
                         F.col(y_col).cast("double").alias("y"))
    from pyspark.sql.types import DoubleType, StructField, StructType
    schema = StructType(list(base.schema.fields)
                        + [StructField("yhat", DoubleType())])

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        n = len(pdf)
        if n < 2 * m:
            return pdf.iloc[0:0].assign(yhat=pd.Series(dtype="float64"))
        ys = [float(v) for v in pdf["y"]]
        mean0 = sum(ys[0:m]) / m
        tr = (sum(ys[m:2 * m]) / m - mean0) / m
        lev = mean0 + tr * (m - 1) / 2.0
        season = [ys[i] - (mean0 + (i - (m - 1) / 2.0) * tr)
                  for i in range(m)]
        yhat = []
        for t in range(m, n):
            s_old = season[t % m]
            yhat.append(lev + tr + s_old)
            lev_new = a * (ys[t] - s_old) + (1.0 - a) * (lev + tr)
            tr = be * (lev_new - lev) + (1.0 - be) * tr
            season[t % m] = ga * (ys[t] - lev_new) + (1.0 - ga) * s_old
            lev = lev_new
        out = pdf.iloc[m:].copy()
        out["yhat"] = yhat
        return out

    return (base.groupBy(*keys).applyInPandas(fit, schema)
            .select(*keys, "bucket",
                    F.round("y", round_to).alias("y"),
                    F.round("yhat", round_to).alias("yhat")))


def acf(events: DataFrame, lags: int = 12,
        bucket_ns: int = 3600 * 10 ** 9,
        ts_col: str = "ts") -> DataFrame:
    """(lag, acf, n_pairs): sample autocorrelation of the regularly
    bucketed event-count series at lags 1..``lags`` — the
    periodicity diagnostic that tells a forecaster (Holt, seasonal
    decompose) WHICH period to model.

    The series densifies onto a bucket spine (missing buckets are
    true zeros, not gaps — skipping them would splice non-adjacent
    hours together); the standard estimator divides every lag's
    cross-product sum by the lag-0 sum of squares around the FULL
    series mean. All ``lags`` lag columns come from ONE ordered
    window pass over the AGGREGATED series (thousands of rows — the
    single-task sort is bounded by the time span, never the event
    count; same contract as the WoW/EWMA family)."""
    from pyspark.sql import Window

    b = F.expr(f"{ts_col} div {bucket_ns}")
    counts = (events.where(F.col(ts_col).isNotNull())
              .groupBy(b.alias("b"))
              .agg(F.count(F.lit(1)).cast("double").alias("x")))
    rng = counts.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    spine = (rng.select(F.explode(F.sequence("lo", "hi")).alias("b")))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0.0)).alias("x")))
    mean = series.agg(F.avg("x").alias("mu"))
    d = (series.join(F.broadcast(mean))
         .select("b", (F.col("x") - F.col("mu")).alias("d")))
    w = Window.orderBy("b")
    lag_cols = [F.lag("d", k).over(w).alias(f"_l{k}")
                for k in range(1, lags + 1)]
    wide = d.select("d", *lag_cols)
    aggs = [F.sum(F.col("d") * F.col("d")).alias("_den")]
    for k in range(1, lags + 1):
        aggs.append(F.sum(F.col("d") * F.col(f"_l{k}")).alias(f"_n{k}"))
        aggs.append(F.count(F.col(f"_l{k}")).alias(f"_c{k}"))
    red = wide.agg(*aggs)
    # try_divide: a constant (zero-variance) series yields NULL acf
    # rather than an ANSI divide-by-zero error
    entries = [F.struct(F.lit(k).alias("lag"),
                        F.try_divide(F.col(f"_n{k}"), F.col("_den"))
                         .alias("acf"),
                        F.col(f"_c{k}").alias("n_pairs"))
               for k in range(1, lags + 1)]
    return (red.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.lag", F.round("e.acf", 6).alias("acf"),
                    "e.n_pairs"))


def cusum_alarm(events: DataFrame, slack: float = 0.5,
                threshold: float = 5.0,
                bucket_ns: int = 3600 * 10 ** 9,
                ts_col: str = "ts",
                val_col: str = "value") -> DataFrame:
    """(b, x, cusum_hi, cusum_lo, alarm): one/two-sided CUSUM control
    chart over the bucketed series — the SEQUENTIAL drift alarm that
    fires on small persistent shifts long before a fixed threshold
    on x does (the complement to change-point scoring, which looks
    backward; CUSUM is what a monitor runs forward).

    The textbook recursion S_t = max(0, S_{t-1} + y_t) is sequential,
    but it has a closed WINDOW form: with C_t = cumsum(y), S_t =
    C_t - min_{s<=t} C_s — so both one-sided charts are two cumulative
    windows over the AGGREGATED series (bounded by the time span,
    the WoW/EWMA window class), no stateful pass, and every term is
    the same IEEE chain on both engines. y_t standardizes against the
    series' own mean/std with ``slack`` absorbing normal drift;
    ``threshold`` is in sigma units (textbook h=5)."""
    from pyspark.sql import Window

    b = F.expr(f"{ts_col} div {bucket_ns}")
    series = (events.where(F.col(ts_col).isNotNull()
                           & F.col(val_col).isNotNull())
              .groupBy(b.alias("b"))
              .agg(F.avg(val_col).alias("x")))
    mom = series.agg(F.avg("x").alias("mu"),
                     F.stddev_samp("x").alias("sd"))
    z = (series.join(F.broadcast(mom))
         .select("b", "x",
                 ((F.col("x") - F.col("mu")) / F.col("sd")).alias("z")))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    c = z.select("b", "x",
                 F.sum(F.col("z") - slack).over(w).alias("c_hi"),
                 F.sum(F.col("z") + slack).over(w).alias("c_lo"))
    out = c.select(
        "b", F.round("x", 6).alias("x"),
        F.round(F.col("c_hi") - F.min("c_hi").over(w), 6)
         .alias("cusum_hi"),
        F.round(F.max("c_lo").over(w) - F.col("c_lo"), 6)
         .alias("cusum_lo"))
    return (out.withColumn("alarm",
                           (F.col("cusum_hi") > threshold)
                           | (F.col("cusum_lo") > threshold))
            .orderBy("b"))


def forecast_eval(fitted: DataFrame, key_cols, bucket_col: str = "bucket",
                  y_col: str = "y", yhat_col: str = "yhat") -> DataFrame:
    """(key..., n_eval, mae, rmse, smape, mase): backtest scores for a
    one-step-ahead fitted series (holt_forecast / holt_winters output
    shape) — the Hyndman & Koehler (2006) scale-free readout. MASE
    divides the forecast's MAE by the NAIVE forecast's (y_{t-1}) MAE
    on the same evaluation rows: < 1 beats naive, and unlike MAPE it
    survives zero-valued buckets; sMAPE is reported for continuity
    with legacy dashboards.

    Per-term quantities quantize to integer units before summing
    (|err| at 1e-6, err^2 at 1e-6, sMAPE terms at 1e-12), so per-key
    sums are partitioning-invariant and MASE is a pure integer ratio
    — the whole report reproduces bit-for-bit cross-engine. One lag
    window + one key-sized aggregate over the already-AGGREGATED
    series; nothing scales with facts."""
    from pyspark.sql import Window

    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    y = F.col(y_col)
    yh = F.col(yhat_col)
    d = (fitted.withColumn("_naive", F.lag(y).over(w))
         .where(yh.isNotNull() & F.col("_naive").isNotNull()))
    err = F.abs(y - yh)
    qa = F.round(err * F.lit(1e6), 0).cast("long")
    qn = F.round(F.abs(y - F.col("_naive")) * F.lit(1e6), 0).cast("long")
    qs = F.round((y - yh) * (y - yh) * F.lit(1e6), 0).cast("long")
    denom = F.abs(y) + F.abs(yh)
    qm = F.when(denom > 0,
                F.round(F.lit(2.0) * err / denom * F.lit(1e12), 0)
                 .cast("long"))
    agg = (d.select(*keys, qa.alias("qa"), qn.alias("qn"),
                    qs.alias("qs"), qm.alias("qm"))
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n_eval"),
                F.sum("qa").alias("sae"), F.sum("qn").alias("san"),
                F.sum("qs").alias("ssq"), F.sum("qm").alias("ssm"),
                F.count("qm").alias("nm")))
    return agg.select(
        *keys, "n_eval",
        F.round(F.col("sae") / F.lit(1e6) / F.col("n_eval"), 6)
         .alias("mae"),
        F.round(F.sqrt(F.col("ssq") / F.lit(1e6) / F.col("n_eval")), 6)
         .alias("rmse"),
        F.round(F.try_divide(F.col("ssm") / F.lit(1e12),
                             F.col("nm")), 6).alias("smape"),
        F.round(F.try_divide(F.col("sae"), F.col("san")), 6)
         .alias("mase"))


def detect_peaks(series: DataFrame, key_cols, bucket_col: str = "bucket",
                 y_col: str = "y", w: int = 2,
                 iqr_k: float = 1.5) -> DataFrame:
    """(key..., bucket, y, thresh): anomalous PEAKS in a per-key
    series — buckets that are a strict local maximum over the ±``w``
    neighboring buckets AND exceed the key's Tukey fence
    (p75 + iqr_k * IQR, the boxplot outlier rule) — the monitoring
    alert shape ("this hour spiked") that CUSUM's cumulative-shift
    and the residual-anomaly operators don't isolate: a single
    spike barely moves CUSUM, and a level shift is not a peak.

    Two exact per-key quantiles (broadcast back — key-sized table)
    + one ordered window for the 2w neighbor comparisons over the
    AGGREGATED series; ROW-neighbor semantics on the observed
    buckets (gaps compare against the nearest observed neighbors —
    densify upstream via resample if calendar adjacency matters)."""
    from pyspark.sql import Window

    keys = list(key_cols)
    qs = (series.groupBy(*keys)
          .agg(F.expr(f"percentile({y_col}, 0.25D)").alias("_q1"),
               F.expr(f"percentile({y_col}, 0.75D)").alias("_q3")))
    thresh = (F.col("_q3")
              + F.lit(float(iqr_k)) * (F.col("_q3") - F.col("_q1")))
    ww = Window.partitionBy(*keys).orderBy(bucket_col)
    neigh = [F.lag(y_col, i).over(ww) for i in range(1, w + 1)] \
        + [F.lead(y_col, i).over(ww) for i in range(1, w + 1)]
    is_peak = reduce(
        lambda a, b: a & b,
        [F.coalesce(F.col(y_col) > n, F.lit(True)) for n in neigh])
    return (series.join(F.broadcast(qs), keys)
            .withColumn("_pk", is_peak)
            .where(F.col("_pk") & (F.col(y_col) > thresh))
            .select(*keys, bucket_col, y_col,
                    F.round(thresh, 6).alias("thresh"))
            .orderBy(*keys, bucket_col))
