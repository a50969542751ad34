"""Hypothesis-testing / distribution-audit operators.

The reference inherits PostgreSQL's aggregate surface (variance,
stddev, corr — recathon adds nothing on top), and every experiment
platform built on it immediately layers the same three primitives:
a two-sample location test for A/B readouts, a contingency-table
independence test for categorical association, and a digit-law audit
for metric integrity. Each is ONE aggregation pass here — the
statistics are algebraic (count / sum / sum-of-squares class), so
they compute map-side-partial and meet in a handful of reduced rows;
nothing in this module scales with anything but the number of
groups/categories.

Scale shape at 100 TB: the fact scan is the entire cost. Group
moments (Welch), cell counts (chi-square), digit counts (Benford)
all collapse map-side before the shuffle; the margin/baseline tables
the finishers join against are category-sized and broadcast. No
windows, no driver collection, no second scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_ttest(df: DataFrame, group_col: str, val_col: str,
                baseline: str) -> DataFrame:
    """Welch's unequal-variance t statistic of every group against
    ``baseline`` (the A/B/n readout: control vs each treatment).

    One groupBy computes (n, mean, var_samp) per group; the baseline's
    single row broadcast-joins back onto the others. Returns one row
    per non-baseline group: n, mean, mean_diff, t_stat and the
    Welch–Satterthwaite degrees of freedom. ``var_samp`` is the
    n-1-denominator sample variance on both engines, and the t/df
    arithmetic is plain IEEE ops over already-reduced scalars, so the
    result is oracle-stable under the suite's 6-decimal rounding.
    """
    moments = (df.groupBy(group_col)
               .agg(F.count(val_col).alias("n"),
                    F.avg(val_col).alias("mean"),
                    F.var_samp(val_col).alias("var")))
    base = (moments.filter(F.col(group_col) == baseline)
            .select(F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
                    F.col("var").alias("var_b")))
    se2 = F.col("var") / F.col("n") + F.col("var_b") / F.col("n_b")
    t = (F.col("mean") - F.col("mean_b")) / F.sqrt(se2)
    wdf = (se2 * se2) / (
        (F.col("var") / F.col("n")) ** 2 / (F.col("n") - 1)
        + (F.col("var_b") / F.col("n_b")) ** 2 / (F.col("n_b") - 1))
    return (moments.filter(F.col(group_col) != baseline)
            .join(F.broadcast(base))
            .select(group_col, "n",
                    F.round("mean", 6).alias("mean"),
                    F.round(F.col("mean") - F.col("mean_b"), 6)
                     .alias("mean_diff"),
                    F.round(t, 6).alias("t_stat"),
                    F.round(wdf, 4).alias("welch_df")))


def chi_square_independence(df: DataFrame, col_a: str,
                            col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size.

    The observed table is one groupBy over the fact scan; margins
    reduce from it (category-sized, broadcast). Expected counts come
    from the FULL margin cross product left-joined to the observed
    cells — structurally-empty cells still contribute their expected
    mass, which the observed-cells-only shortcut silently drops.
    Returns a single row: n, dof, chi2, cramers_v.
    """
    obs = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).cast("double").alias("obs"))
    row_m = obs.groupBy(col_a).agg(F.sum("obs").alias("row_tot"))
    col_m = obs.groupBy(col_b).agg(F.sum("obs").alias("col_tot"))
    total = obs.agg(F.sum("obs").alias("n"),
                    F.count_distinct(col_a).cast("long").alias("ra"),
                    F.count_distinct(col_b).cast("long").alias("cb"))
    cells = (row_m.join(F.broadcast(col_m)).join(F.broadcast(total))
             .join(F.broadcast(obs), [col_a, col_b], "left")
             .withColumn("obs", F.coalesce("obs", F.lit(0.0)))
             .withColumn("exp", F.col("row_tot") * F.col("col_tot")
                         / F.col("n")))
    term = (F.col("obs") - F.col("exp")) ** 2 / F.col("exp")
    return (cells.groupBy("n", "ra", "cb")
            .agg(F.sum(term).alias("chi2"))
            .select(F.col("n").cast("long").alias("n"),
                    ((F.col("ra") - 1) * (F.col("cb") - 1)).alias("dof"),
                    F.round("chi2", 6).alias("chi2"),
                    F.round(F.sqrt(F.col("chi2") / (F.col("n") *
                            F.least(F.col("ra") - 1, F.col("cb") - 1))), 6)
                     .alias("cramers_v")))


def benford_first_digit(df: DataFrame, val_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    standard metric-integrity audit (fabricated or clipped numeric
    columns diverge from log10(1 + 1/d)).

    The digit extracts map-side as floor(a / 10^floor(log10 a)) on
    abs(value) > 0; one 9-group aggregate finishes. Returns one row
    per digit 1..9: n_obs, obs_share, benford_share and the
    chi-square term n·(obs−exp)²/exp — their sum is the test
    statistic, left long-format so the oracle checks every digit.
    floor(log10) is engine-stable away from exact powers of ten
    (measure-zero for continuous metrics).
    """
    a = F.abs(F.col(val_col))
    digit = F.floor(a / F.pow(F.lit(10.0), F.floor(F.log10(a))))
    counts = (df.filter(a > 0)
              .select(digit.cast("int").alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).cast("double").alias("n_obs")))
    tot = counts.agg(F.sum("n_obs").alias("n"))
    benford = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    obs_share = F.col("n_obs") / F.col("n")
    chi_term = (F.col("n") * (obs_share - benford) ** 2 / benford)
    return (counts.join(F.broadcast(tot))
            .select("digit", F.col("n_obs").cast("long").alias("n_obs"),
                    F.round(obs_share, 6).alias("obs_share"),
                    F.round(benford, 6).alias("benford_share"),
                    F.round(chi_term, 6).alias("chi2_term"))
            .orderBy("digit"))


def two_proportion_ztest(df: DataFrame, group_col: str, success,
                         baseline: str) -> DataFrame:
    """Two-proportion z statistic of every group's success rate
    against ``baseline`` (the conversion-rate readout beside
    ``welch_ttest``'s continuous one). ``success`` is a boolean
    Column; the pooled-variance z uses the standard normal
    approximation. Same shape as welch_ttest: one groupBy for
    (n, successes), baseline row broadcast back — nothing but the
    fact scan costs anything at scale."""
    moments = (df.groupBy(F.col(group_col).alias("grp"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(success.cast("long")).alias("x")))
    base = (moments.filter(F.col("grp") == baseline)
            .select(F.col("n").alias("n_b"), F.col("x").alias("x_b")))
    p = F.col("x") / F.col("n")
    pb = F.col("x_b") / F.col("n_b")
    pool = (F.col("x") + F.col("x_b")) / (F.col("n") + F.col("n_b"))
    z = (p - pb) / F.sqrt(pool * (1 - pool)
                          * (1.0 / F.col("n") + 1.0 / F.col("n_b")))
    return (moments.filter(F.col("grp") != baseline)
            .join(F.broadcast(base))
            .select(F.col("grp").alias(group_col), "n", "x",
                    F.round(p, 6).alias("rate"),
                    F.round(p - pb, 6).alias("rate_diff"),
                    F.round(z, 6).alias("z_stat")))


def anova_oneway(df: DataFrame, group_col: str,
                 val_col: str) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups (the k-sample
    generalization of ``welch_ttest``): F = (SSB/(k-1)) / (SSW/(N-k))
    from purely algebraic per-group moments — one groupBy, one
    category-sized finisher, nothing else.

    SSB computes from group means vs the grand mean (derived from the
    same reduced rows, not a second scan); SSW from per-group
    variances. Returns one row: n, k, dof_between, dof_within,
    f_stat, eta_sq (SSB/SST effect size)."""
    g = (df.groupBy(group_col)
         .agg(F.count(val_col).alias("n_g"),
              F.sum(val_col).alias("s_g"),
              F.var_samp(val_col).alias("var_g")))
    tot = g.agg(F.sum("n_g").alias("n"),
                F.sum("s_g").alias("s"),
                F.count(F.lit(1)).alias("k"))
    j = g.join(F.broadcast(tot))
    mean_g = F.col("s_g") / F.col("n_g")
    grand = F.col("s") / F.col("n")
    ssb = F.sum(F.col("n_g") * (mean_g - grand) ** 2)
    ssw = F.sum((F.col("n_g") - 1) * F.col("var_g"))
    agg = j.groupBy("n", "k").agg(ssb.alias("ssb"), ssw.alias("ssw"))
    msb = F.col("ssb") / (F.col("k") - 1)
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    return agg.select(
        F.col("n"), F.col("k"),
        (F.col("k") - 1).alias("dof_between"),
        (F.col("n") - F.col("k")).alias("dof_within"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6)
         .alias("eta_sq"))


def ks_test(df: DataFrame, group_col: str, val_col: str,
            group_a, group_b) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between ``group_a``
    and ``group_b``: D = sup |F_a(x) - F_b(x)| over the empirical
    CDFs — the distribution-shape test where Welch only compares
    locations. Returns one row: n_a, n_b, d_stat and the scaled
    ks_stat = D * sqrt(n_a*n_b/(n_a+n_b)) (asymptotically
    Kolmogorov-distributed).

    Shape: per-VALUE counts collapse first (one map-side-combined
    aggregate), then one cumulative window over the DISTINCT-value
    table — per-task state is bounded by value cardinality, not row
    count (2-decimal metrics: thousands of rows). For genuinely
    continuous 100 TB columns, quantize upstream (binned KS, the
    standard concession). CDF steps are exact integer-count ratios,
    so the oracle match is bit-exact."""
    from pyspark.sql import Window

    d = df.where(F.col(group_col).isin([group_a, group_b])
                 & F.col(val_col).isNotNull())
    # materialized once (value-cardinality rows): the totals leg and
    # the cumulative leg otherwise each re-run the raw-table aggregate
    # — two full input scans for one test (r12 plan audit)
    counts = (d.groupBy(F.col(val_col).alias("v"))
              .agg(F.sum(F.when(F.col(group_col) == group_a, 1)
                         .otherwise(0)).alias("ca"),
                   F.sum(F.when(F.col(group_col) == group_b, 1)
                         .otherwise(0)).alias("cb"))
              .localCheckpoint(eager=True))
    tot = counts.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = (counts.join(F.broadcast(tot))
           .select("n_a", "n_b",
                   (F.sum("ca").over(w) / F.col("n_a")).alias("fa"),
                   (F.sum("cb").over(w) / F.col("n_b")).alias("fb")))
    return (cum.groupBy("n_a", "n_b")
            .agg(F.max(F.abs(F.col("fa") - F.col("fb"))).alias("d"))
            .select(F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.round("d", 6).alias("d_stat"),
                    F.round(F.col("d") * F.sqrt(
                        F.col("n_a") * F.col("n_b")
                        / (F.col("n_a") + F.col("n_b"))), 6)
                     .alias("ks_stat")))


def mann_whitney_u(df: DataFrame, group_col: str, val_col: str,
                   group_a, group_b) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of ``group_a`` vs
    ``group_b``: the rank-based location test that survives heavy
    tails and outliers where Welch's mean-based t does not. Returns
    one row: n_a, n_b, u_stat and the tie-corrected normal
    approximation z_stat.

    Same value-level shape as ``ks_test`` — and the reason it scales:
    U needs only HOW MANY b-values precede each distinct value, never
    a global per-row ranking. Per-value counts collapse map-side; one
    cumulative window over the distinct-value table computes
    U = sum_v ca(v) * (#b below v + 0.5*cb(v)); the tie-correction
    term sums per-value tie counts. Counts are integers, so U is
    bit-exact cross-engine."""
    from pyspark.sql import Window

    d = df.where(F.col(group_col).isin([group_a, group_b])
                 & F.col(val_col).isNotNull())
    counts = (d.groupBy(F.col(val_col).alias("v"))
              .agg(F.sum(F.when(F.col(group_col) == group_a, 1)
                         .otherwise(0)).alias("ca"),
                   F.sum(F.when(F.col(group_col) == group_b, 1)
                         .otherwise(0)).alias("cb")))
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    per_v = counts.select(
        "ca", "cb",
        F.coalesce(F.sum("cb").over(w_prev), F.lit(0)).alias("b_below"),
        ((F.col("ca") + F.col("cb")) ** 3
         - (F.col("ca") + F.col("cb"))).alias("tie3"))
    agg = per_v.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * (F.col("b_below") + 0.5 * F.col("cb")))
         .alias("u"),
        F.sum("tie3").alias("t3"))
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    mu = na * nb / 2.0
    sigma = F.sqrt(na * nb / 12.0
                   * ((n + 1) - F.col("t3") / (n * (n - 1))))
    return agg.select(na.cast("long").alias("n_a"),
                      nb.cast("long").alias("n_b"),
                      F.round("u", 4).alias("u_stat"),
                      F.round((F.col("u") - mu) / sigma, 6)
                       .alias("z_stat"))


def gini(df: DataFrame, entity_col: str, val_col: str) -> DataFrame:
    """(n, total, gini): Gini concentration coefficient of
    ``val_col`` mass across entities — the inequality scalar behind
    the Pareto/ABC banding (supplier_pareto shows WHERE the curve
    bends; Gini is the one-number summary dashboards track).

    Per-entity totals reduce first (one groupBy over the fact scan);
    the rank window then runs over ENTITY-count rows, bounded like
    every aggregated-series window here. G = (2*sum(i*x_i) - (n+1)*
    sum(x)) / (n*sum(x)) over ascending totals; tied totals give the
    same answer under any tie order, so the id tiebreak is for
    determinism of the plan, not the value."""
    from pyspark.sql import Window

    per = (df.groupBy(F.col(entity_col).alias("e"))
           .agg(F.sum(val_col).alias("x")))
    w = Window.orderBy(F.col("x").asc(), F.col("e").asc())
    ranked = per.select("x", F.row_number().over(w).alias("i"))
    agg = ranked.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("x").alias("s"),
                     F.sum(F.col("i") * F.col("x")).alias("ix"))
    g = ((2.0 * F.col("ix") - (F.col("n") + 1) * F.col("s"))
         / (F.col("n") * F.col("s")))
    # total rounds to WHOLE units: at 1e10+ magnitudes, 4 decimals is
    # 15 significant digits — past the determinism of a parallel
    # double sum (sf0.1 sweep caught a last-ulp spread, r9)
    return agg.select(F.col("n").cast("long").alias("n"),
                      F.round("s", 0).alias("total"),
                      F.round(g, 6).alias("gini"))


def sprt_monitor(df: DataFrame, bucket: "F.Column", success,
                 p0: float, p1: float,
                 alpha: float = 0.05, beta: float = 0.05) -> DataFrame:
    """Wald SPRT sequential monitor for a binomial rate: at every
    time ``bucket`` (the peek granularity), the cumulative
    log-likelihood ratio of H1: p=p1 vs H0: p=p0 and the anytime
    decision — the sequential companion to the fixed-horizon
    two_proportion_ztest, i.e. "stop the experiment the moment the
    evidence crosses Wald's boundaries" instead of waiting for a
    preplanned n (Wald 1945; the always-valid-inference staple).

        llr_n = s * ln(p1/p0) + (n - s) * ln((1-p1)/(1-p0))
        accept H1 when llr >= ln((1-beta)/alpha)
        accept H0 when llr <= ln(beta/(1-alpha))

    Scale shape: the per-bucket (successes, trials) rollup is the
    only pass over the facts (map-side partial); the running sums
    then run over the BUCKET rollup — thousands of rows however big
    the fact table — so the single-partition ordered window is
    cardinality-bounded by the peek schedule, never by the data.
    The four log constants are computed once driver-side (Python
    floats embedded as literals), so the per-row math is integer
    counts times identical doubles: bit-reproducible cross-engine.

    Returns (bucket, trials, successes, llr, decision) per bucket,
    decision in {'accept_h1', 'accept_h0', 'continue'} — the state
    HAD the monitor peeked at that bucket's close.
    """
    import math

    from pyspark.sql import Window

    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0 and p0 != p1):
        raise ValueError("need 0 < p0, p1 < 1 and p0 != p1")
    la = math.log(p1 / p0)
    lb = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    per = (df.groupBy(bucket.alias("bucket"))
             .agg(F.sum(success.cast("long")).alias("s"),
                  F.count(F.lit(1)).alias("n")))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (per.withColumn("successes", F.sum("s").over(w))
              .withColumn("trials", F.sum("n").over(w)))
    llr = (F.col("successes") * F.lit(la)
           + (F.col("trials") - F.col("successes")) * F.lit(lb))
    decision = (F.when(llr >= F.lit(upper), F.lit("accept_h1"))
                 .when(llr <= F.lit(lower), F.lit("accept_h0"))
                 .otherwise(F.lit("continue")))
    return (cum.select("bucket", "trials", "successes",
                       F.round(llr, 6).alias("llr"),
                       decision.alias("decision"))
            .orderBy("bucket"))


def auc_rank(df: DataFrame, score_col: str, label) -> DataFrame:
    """ROC AUC of a scorer via the rank-sum (Mann-Whitney) identity:
    AUC = P(score_pos > score_neg) + P(tie)/2, computed from average
    ranks — the standard classifier/retrieval eval without a single
    threshold sweep. ``label`` is a boolean Column.

    One global rank window over the scores + one aggregate. Exactness
    trick: with min-rank r and tie-group size t, twice the average
    rank is the INTEGER 2r + t - 1, so twice-the-rank-sum S2 stays
    exact and AUC = (S2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg) is one
    IEEE division of exact integers — bit-reproducible cross-engine.

    Scale shape: the rank is a global-order window over the SCORED
    rows; for 100 TB pre-bin scores to a fixed grid (the identity
    holds on binned ties) so the window runs over the bin rollup.
    Returns one row: n_pos, n_neg, auc.
    """
    from pyspark.sql import Window

    d = df.select(F.col(score_col).alias("_s"),
                  label.cast("boolean").alias("_y"))
    w = Window.orderBy("_s")
    tw = Window.partitionBy("_s")
    ranked = (d.withColumn("_r", F.rank().over(w))
               .withColumn("_t", F.count(F.lit(1)).over(tw)))
    agg = ranked.agg(
        F.sum(F.when(F.col("_y"),
                     2 * F.col("_r") + F.col("_t") - 1)).alias("s2"),
        F.sum(F.col("_y").cast("long")).alias("n_pos"),
        F.sum((~F.col("_y")).cast("long")).alias("n_neg"))
    # try_divide: a single-class label has no defined AUC -> NULL
    auc = F.try_divide(
        F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1),
        2 * F.col("n_pos") * F.col("n_neg"))
    return agg.select("n_pos", "n_neg", auc.alias("auc"))


def calibration_table(df: DataFrame, score_col: str, label,
                      bins: int = 10) -> DataFrame:
    """Reliability table for a [0,1] scorer: fixed-width score bins
    with observed positive rate vs mean predicted score, plus each
    bin's contribution to the Brier score — AUC (auc_rank) measures
    RANKING, this measures whether the score's VALUE means what it
    says (a miscalibrated-but-monotone scorer has perfect AUC and a
    useless probability). One map-side bin assignment + one
    bins-sized aggregate; nothing scales past the fact scan.

    Returns per non-empty bin: bin, n, frac_pos (exact integer
    ratio), mean_score, brier_term = sum((score - y)^2)/N_total —
    summing brier_term over bins gives the Brier score.
    """
    d = df.select(F.col(score_col).alias("_s"),
                  label.cast("boolean").alias("_y"))
    b = F.least(F.lit(bins - 1),
                F.floor(F.col("_s") * bins).cast("int"))
    per = (d.withColumn("_b", b)
           .groupBy("_b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_y").cast("long")).alias("pos"),
                F.sum("_s").alias("ssum"),
                F.sum((F.col("_s") - F.col("_y").cast("double"))
                      * (F.col("_s") - F.col("_y").cast("double")))
                .alias("sqerr")))
    tot = per.agg(F.sum("n").alias("nt"))
    return (per.join(F.broadcast(tot))
            .select(F.col("_b").alias("bin"), "n",
                    (F.col("pos") / F.col("n")).alias("frac_pos"),
                    F.round(F.col("ssum") / F.col("n"), 6)
                     .alias("mean_score"),
                    F.round(F.col("sqerr") / F.col("nt"), 6)
                     .alias("brier_term"))
            .orderBy("bin"))


def gains_table(df: DataFrame, score_col: str, label, id_col: str,
                deciles: int = 10) -> DataFrame:
    """Cumulative gains / lift table: rank by score descending, cut
    into ``deciles``, and report how much of the total positive mass
    the top k/10 captures vs random (lift) — the campaign-targeting
    readout beside auc_rank (ranking) and calibration_table
    (probability). ``id_col`` pins tie order so the decile CUT is
    deterministic cross-engine even with heavily tied scores.

    All outputs are exact integer ratios (counts only), emitted
    unrounded. The rank window is global over scored rows — same
    zipWithIndex-shape note as quantile_normalize: pre-aggregate to a
    score grid at corpus scale.
    """
    from pyspark.sql import Window

    d = df.select(F.col(score_col).alias("_s"),
                  label.cast("long").alias("_y"),
                  F.col(id_col).alias("_id"))
    w = Window.orderBy(F.desc("_s"), F.col("_id"))
    decd = d.withColumn("_d", F.ntile(deciles).over(w))
    per = (decd.groupBy("_d")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("_y").alias("pos")))
    cw = (Window.orderBy("_d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = per.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    return (per.withColumn("cum_n", F.sum("n").over(cw))
            .withColumn("cum_pos", F.sum("pos").over(cw))
            .join(F.broadcast(tot))
            .select(F.col("_d").alias("decile"), "n", "pos",
                    "cum_n", "cum_pos",
                    F.try_divide(F.col("cum_pos"), F.col("pt"))
                     .alias("capture"),
                    F.try_divide(F.col("cum_pos") * F.col("nt"),
                                 F.col("pt") * F.col("cum_n"))
                     .alias("lift"))
            .orderBy("decile"))


def qini_table(df: DataFrame, score_col: str, treated, converted,
               id_col: str, deciles: int = 10) -> DataFrame:
    """Qini / uplift curve: rank units by an uplift score, cut into
    ``deciles``, and report the cumulative INCREMENTAL conversions —
    treated converters minus the control converters scaled to the
    treated exposure:

        qini(k) = cum_conv_t(k) - cum_conv_c(k) * cum_n_t(k)/cum_n_c(k)

    — the causal cousin of gains_table (which measures response, not
    uplift: a model that targets sure-things scores high on gains and
    flat on Qini). ``treated``/``converted`` are boolean Columns;
    ties pin on ``id_col``. Same shape as gains_table: one ntile
    window over scored units, one deciles-sized cumulative finisher —
    integer counts end to end, one exact division per row.
    """
    from pyspark.sql import Window

    d = df.select(F.col(score_col).alias("_s"),
                  treated.cast("long").alias("_t"),
                  converted.cast("long").alias("_y"),
                  F.col(id_col).alias("_id"))
    w = Window.orderBy(F.desc("_s"), F.col("_id"))
    per = (d.withColumn("_d", F.ntile(deciles).over(w))
           .groupBy("_d")
           .agg(F.sum("_t").alias("n_t"),
                F.sum(F.lit(1) - F.col("_t")).alias("n_c"),
                F.sum(F.col("_t") * F.col("_y")).alias("conv_t"),
                F.sum((F.lit(1) - F.col("_t")) * F.col("_y"))
                .alias("conv_c")))
    cw = (Window.orderBy("_d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (per.withColumn("cum_n_t", F.sum("n_t").over(cw))
           .withColumn("cum_n_c", F.sum("n_c").over(cw))
           .withColumn("cum_conv_t", F.sum("conv_t").over(cw))
           .withColumn("cum_conv_c", F.sum("conv_c").over(cw)))
    # try_divide: a leading decile with no control units yet has no
    # defined uplift (NULL), not a crash — ANSI mode is on
    qini = (F.col("cum_conv_t")
            - F.try_divide(F.col("cum_conv_c") * F.col("cum_n_t"),
                           F.col("cum_n_c")))
    return (cum.select(F.col("_d").alias("decile"),
                       "n_t", "n_c", "conv_t", "conv_c",
                       "cum_n_t", "cum_n_c",
                       F.round(qini, 6).alias("qini"))
            .orderBy("decile"))


def spearman_corr(df: DataFrame, col_a: str,
                  col_b: str) -> DataFrame:
    """Spearman rank correlation: Pearson over average ranks — the
    monotone-association readout that ignores scale and outliers
    (corr_matrix's Pearson answers LINEAR association). Ties take
    average ranks via the exact 2r+t-1 integer form (the auc_rank
    trick), so the rank columns are exact halves and the closed-form
    Pearson over them is engine-stable under 6-decimal rounding.
    Two global rank windows over the fact rows (pre-bin at corpus
    scale); one algebraic finisher. Returns (n, spearman)."""
    from pyspark.sql import Window

    d = df.select(F.col(col_a).alias("_a"),
                  F.col(col_b).alias("_b")).na.drop()

    def avg_rank2(c):  # TWICE the average rank (exact integer)
        w = Window.orderBy(c)
        tw = Window.partitionBy(c)
        return (2 * F.rank().over(w) + F.count(F.lit(1)).over(tw) - 1)

    ranked = (d.withColumn("_ra", avg_rank2(F.col("_a")))
               .withColumn("_rb", avg_rank2(F.col("_b"))))
    # sums stay exact int64 (sum of (2r)^2 <= 4n^3 fits to ~100M
    # rows); the FINISHER products would overflow int64, so they
    # combine as doubles — same exact-int inputs on both engines ->
    # identical IEEE results
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_ra").cast("double").alias("sa"),
        F.sum("_rb").cast("double").alias("sb"),
        F.sum(F.col("_ra") * F.col("_ra")).cast("double").alias("saa"),
        F.sum(F.col("_rb") * F.col("_rb")).cast("double").alias("sbb"),
        F.sum(F.col("_ra") * F.col("_rb")).cast("double").alias("sab"))
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    den = F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
                 * (F.col("n") * F.col("sbb")
                    - F.col("sb") * F.col("sb")))
    return agg.select(F.col("n").cast("long").alias("n"),
                      F.round(F.try_divide(num, den), 6)
                      .alias("spearman"))


# Poisson(1) CDF thresholds scaled to the 60-bit md5 hash range:
# t[k] = floor(P(X <= k) * 2^60). A uniform 60-bit hash compared
# against these INTEGER literals draws Poisson(1) deterministically —
# no float division, no RNG state, bit-identical in any engine.
_POISSON1_CDF60 = [424136118829305344, 848272237658610688,
                   1060340297073263360, 1131029650211480960,
                   1148701988496035328, 1152236456152946176]


def poisson_bootstrap_ci(df: DataFrame, group_col: str, val_col: str,
                         id_col: str, n_boot: int = 100,
                         alpha: float = 0.05,
                         scale: int = 1_000_000) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    POISSON bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams" — Google's distributed bootstrap; also
    Kleiner et al.'s BLB lineage): classical resampling needs n draws
    WITH replacement from n rows — a global operation — but each
    row's multiplicity in a resample is asymptotically Poisson(1),
    which each executor can draw locally from a hash of (row id,
    replicate id). No resample ever materializes: replicate b is just
    a weighted aggregate.

    Scale shape: the map side explodes each row into n_boot weighted
    copies but the aggregate combines them map-side, so the SHUFFLE
    is groups x n_boot rows however big the table; CPU is n_boot x
    one scan — the knob to budget. Values quantize to integers
    (round(v*scale)) so every replicate sum is exact int64 and the
    whole readout — point mean, per-replicate means, CI bounds as
    order statistics of the n_boot means — is partitioning-invariant
    and bit-reproducible cross-engine.

    Returns (grp, n_rows, mean, ci_lo, ci_hi): the percentile-method
    (alpha/2, 1-alpha/2) interval."""
    from pyspark.sql import Window

    from recdb_postgresql_spark.functions.hashing import md5_long

    v = F.round(F.col(val_col).cast("double") * F.lit(float(scale)), 0) \
         .cast("long")
    base = (df.where(F.col(val_col).isNotNull())
            .select(F.col(group_col).alias("grp"), v.alias("v"),
                    F.col(id_col).cast("string").alias("_id")))

    rep = base.select(
        "grp", "v", "_id",
        F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("b"))
    # (measured: halving md5 count via two 60-bit slices per digest
    # does NOT pay — the cost is the B-fold ROW volume through
    # codegen+combine, not the digest; and the NO-explode wide form —
    # 2B aggregate expressions with inline per-row weights — is 13x
    # WORSE (6.4 s vs 0.49 s at sf0.1/B=100): 200 aggregates fall out
    # of whole-stage codegen. Keep the simple per-(row,b) hash and
    # budget with n_boot as SCALING.md documents — family closed r10)
    h = md5_long(F.concat(F.col("_id"), F.lit(":"),
                          F.col("b").cast("string")))
    w = F.when(h < _POISSON1_CDF60[0], 0)
    for k in range(1, 6):
        w = w.when(h < _POISSON1_CDF60[k], k)
    w = w.otherwise(6).cast("long")

    means = (rep.withColumn("w", w)
             .groupBy("grp", "b")
             .agg(F.sum("w").alias("nb"),
                  F.sum(F.col("w") * F.col("v")).alias("sb"))
             .where(F.col("nb") > 0)
             .select("grp", "b",
                     (F.col("sb") / F.col("nb") / F.lit(float(scale)))
                     .alias("mb")))
    wn = Window.partitionBy("grp").orderBy("mb", "b")
    ranked = (means
              .withColumn("r", F.row_number().over(wn))
              .withColumn("nb_eff", F.count(F.lit(1)).over(
                  Window.partitionBy("grp"))))
    lo_r = F.greatest(F.ceil(F.lit(alpha / 2.0) * F.col("nb_eff"))
                      .cast("long"), F.lit(1))
    hi_r = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("nb_eff")) \
            .cast("long")
    ci = (ranked.groupBy("grp")
          .agg(F.max(F.when(F.col("r") == lo_r, F.col("mb")))
               .alias("ci_lo"),
               F.max(F.when(F.col("r") == hi_r, F.col("mb")))
               .alias("ci_hi")))
    pe = (base.groupBy("grp")
          .agg(F.count(F.lit(1)).alias("n_rows"),
               (F.sum("v") / F.count(F.lit(1)) / F.lit(float(scale)))
               .alias("mean")))
    # left join: a tiny group whose EVERY replicate drew total weight
    # 0 has no CI rows at all — report it with its point mean and
    # NULL bounds rather than silently dropping it from the audit
    return (pe.join(ci, "grp", "left")
            .select("grp", "n_rows", "mean", "ci_lo", "ci_hi")
            .orderBy("grp"))


def mad_outliers(df: DataFrame, group_col: str, val_col: str,
                 id_col: str) -> DataFrame:
    """Robust per-group outlier scores: the Iglewicz-Hoaglin modified
    z-score 0.6745 * (v - median) / MAD, where MAD is the median
    absolute deviation — the outlier detector that (unlike mean/stddev
    z-scores) a few extreme rows cannot drag toward themselves; the
    conventional flag threshold is |mz| > 3.5.

    Two exact-percentile aggregates per group (median, then MAD over
    the residuals) and a broadcast of the group-sized stats table back
    onto the facts — med/MAD rows are per-GROUP, so the join is a
    broadcast at any fact scale. Spark's exact ``percentile`` buffers
    a group's values in executor memory: fine into the tens of
    millions of rows per group; past that swap the two medians for
    ``ddq_quantiles`` sketches (same 6.25% relative error the flag
    threshold easily tolerates) — the swap point, not a rewrite.

    Returns fact rows scored: (grp, id, v, med, mad, mz), mz NULL
    where MAD = 0 (a degenerate constant group has no scale)."""
    base = (df.where(F.col(val_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    F.col(id_col).alias("id"),
                    F.col(val_col).cast("double").alias("v")))
    med = base.groupBy("grp").agg(
        F.expr("percentile(v, 0.5D)").alias("med"))
    resid = base.join(F.broadcast(med), "grp")
    mad = resid.groupBy("grp").agg(
        F.expr("percentile(abs(v - med), 0.5D)").alias("mad"))
    scored = resid.join(F.broadcast(mad), "grp")
    mz = F.try_divide(F.lit(0.6745) * (F.col("v") - F.col("med")),
                      F.col("mad"))
    return scored.select("grp", "id", "v", "med", "mad",
                         F.round(mz, 6).alias("mz"))


def isotonic_calibration(df: DataFrame, score_col: str, label,
                         bins: int = 50) -> DataFrame:
    """Isotonic recalibration of a [0,1] scorer by pool-adjacent-
    violators (PAV) over score bins — the nonparametric step-function
    fix for the miscalibration calibration_table diagnoses (Zadrozny
    & Elkan 2002): fit the best NON-DECREASING positive-rate curve,
    no sigmoid assumption.

    Scale shape: the facts collapse to one bins-sized aggregate
    (map-side combine); PAV runs DRIVER-LOCAL over <= ``bins`` rows
    (the BPE-merge pattern — the sequential algorithm touches
    metadata-sized state only, never facts). Block values are single
    divisions of exact integer sums, and pooling compares rates by
    integer cross-multiplication, so the fitted curve is
    bit-reproducible; the registered oracle recomputes it through the
    Barlow minimax identity iso_i = max_{k<=i} min_{j>=i} avg(k..j)
    — a hash match proves PAV == minimax on real data.

    Returns per non-empty bin: (bin, n, pos, raw_rate, iso_rate),
    iso_rate non-decreasing in bin."""
    d = df.select(F.col(score_col).alias("_s"),
                  label.cast("boolean").alias("_y"))
    b = F.least(F.lit(bins - 1),
                F.floor(F.col("_s") * bins).cast("int"))
    per = (d.withColumn("_b", b)
           .groupBy("_b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_y").cast("long")).alias("pos")))
    rows = sorted((r["_b"], r["n"], r["pos"]) for r in per.collect())
    # PAV over (weight=n, mass=pos) blocks; pool while the previous
    # block's rate exceeds the current one (integer cross-compare)
    blocks = []  # [start_row_idx, w, p]
    for i, (_b, n, pos) in enumerate(rows):
        start, w, p = i, n, pos
        while blocks and blocks[-1][2] * w > p * blocks[-1][1]:
            s0, w0, p0 = blocks.pop()
            start, w, p = s0, w + w0, p + p0
        blocks.append([start, w, p])
    iso = [0.0] * len(rows)
    bounds = [blk[0] for blk in blocks] + [len(rows)]
    for blk, end in zip(blocks, bounds[1:]):
        val = blk[2] / blk[1]
        for i in range(blk[0], end):
            iso[i] = val
    spark = df.sparkSession
    out = [(int(_b), int(n), int(pos), pos / n, iso[i])
           for i, (_b, n, pos) in enumerate(rows)]
    return spark.createDataFrame(
        out, "bin int, n long, pos long, raw_rate double, "
             "iso_rate double").orderBy("bin")


def diff_in_diff(df: DataFrame, treated, post, val_col: str,
                 scale: int = 1000) -> DataFrame:
    """One-row difference-in-differences readout: the 2x2
    (treated x post) cell means, the DiD interaction estimate
    (T_post - T_pre) - (C_post - C_pre), its large-sample SE
    sqrt(sum var_g / n_g over the four cells), and the t statistic —
    the parallel-trends causal design beside the uplift (Qini) and
    sequential (SPRT) readouts here.

    ONE aggregate pass: four cells' (n, sum, sum-of-squares) as
    conditional sums with map-side combine. Values quantize to
    ``scale`` integer units so sums are exact; cell variances come
    from the (n*ssq - s^2)/(n*(n-1)) identity on those exact inputs,
    making the whole row bit-reproducible cross-engine."""
    q = F.round(F.col(val_col).cast("double") * F.lit(float(scale)), 0) \
         .cast("long")
    d = df.where(F.col(val_col).isNotNull()).select(
        treated.cast("boolean").alias("_t"),
        post.cast("boolean").alias("_p"), q.alias("_q"))

    def cell(tv, pv, tag):
        c = (F.col("_t") == tv) & (F.col("_p") == pv)
        return [F.sum(F.when(c, 1).otherwise(0)).alias(f"n_{tag}"),
                F.sum(F.when(c, F.col("_q"))).alias(f"s_{tag}"),
                F.sum(F.when(c, F.col("_q") * F.col("_q")))
                 .alias(f"ss_{tag}")]

    aggs = (cell(True, False, "t_pre") + cell(True, True, "t_post")
            + cell(False, False, "c_pre") + cell(False, True, "c_post"))
    a = d.agg(*aggs)
    sc = F.lit(float(scale))

    def mean(tag):
        return F.col(f"s_{tag}") / F.col(f"n_{tag}") / sc

    def var(tag):  # sample variance in VALUE units
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        ss = F.col(f"ss_{tag}").cast("double")
        return (n * ss - s * s) / (n * (n - 1)) / (sc * sc)

    did = ((mean("t_post") - mean("t_pre"))
           - (mean("c_post") - mean("c_pre")))
    se = F.sqrt(sum(var(t) / F.col(f"n_{t}")
                    for t in ("t_pre", "t_post", "c_pre", "c_post")))
    out = [F.col(f"n_{t}") for t in ("t_pre", "t_post",
                                     "c_pre", "c_post")]
    out += [F.round(mean(t), 6).alias(f"m_{t}")
            for t in ("t_pre", "t_post", "c_pre", "c_post")]
    return a.select(*out, F.round(did, 6).alias("did"),
                    F.round(se, 6).alias("se"),
                    F.round(F.try_divide(did, se), 6).alias("t_stat"))


def rank_biased_overlap(a: DataFrame, b: DataFrame, id_col: str,
                        rank_col: str = "rank", p: float = 0.9,
                        depth: int = 100) -> DataFrame:
    """One row (p, depth, rbo, rbo_min, rbo_ext): rank-biased overlap
    (Webber, Moffat & Zobel 2010) between two rankings — the
    top-weighted agreement score for comparing two scorers' output
    lists (old vs new model, popularity vs personalization), where
    Spearman/Kendall over-weight the tail that top-k serving never
    shows. RBO@D = (1-p) * sum_{d=1..D} p^(d-1) * |A_d ∩ B_d| / d.

    ``rbo`` is the truncated prefix sum; the paper's residual-bounded
    companions close the family: ``rbo_min`` (eq. 11) assumes ZERO
    overlap beyond depth D (the floor any continuation must exceed),
    ``rbo_ext`` (eq. 30, l = s = D) extrapolates the depth-D
    agreement X_D/D through the tail — identical rankings score
    exactly 1.0 under it at any depth. Both are closed forms in the
    same s and X_D the truncated sum already produces (the geometric
    tail constants are Python-evaluated literals, so both engines do
    the same two double ops on the same integers — no cross-engine
    float series).

    An item enters the intersection at depth max(rank_a, rank_b), so
    the per-depth overlap X_d is a cumulative count over a
    depth-sized table: one join on the item id, one (depth x
    distinct-entry-depth) spine join — everything after the id join
    is bounded by ``depth``, never by catalog size. Terms quantize
    to 1e-15 integers before the final sum (bit-reproducible)."""
    ra = a.select(F.col(id_col).alias("_id"),
                  F.col(rank_col).alias("_ra")).where(
        F.col(rank_col) <= depth)
    rb = b.select(F.col(id_col).alias("_id"),
                  F.col(rank_col).alias("_rb")).where(
        F.col(rank_col) <= depth)
    mr = (ra.join(rb, "_id")
          .select(F.greatest("_ra", "_rb").alias("_mr")))
    per = mr.groupBy("_mr").agg(F.count(F.lit(1)).alias("c"))
    spark = a.sparkSession
    spine = spark.range(1, depth + 1).select(
        F.col("id").cast("int").alias("d"))
    xd = (spine.join(F.broadcast(per), per["_mr"] <= spine["d"],
                     "left")
          .groupBy("d")
          .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("x")))
    term = (F.pow(F.lit(float(p)), F.col("d") - 1)
            * F.col("x") / F.col("d"))
    agg = xd.agg(F.sum(F.round(term * F.lit(1e15), 0).cast("long"))
                 .alias("s"),
                 F.max(F.when(F.col("d") == depth, F.col("x")))
                 .alias("xk"))
    # tail constants, evaluated once in Python so engine and oracle
    # apply identical double literals to the same integers:
    #   rbo_min = rbo + (1-p)/p * X_D * (ln(1/(1-p)) - sum_{1..D} p^d/d)
    #   rbo_ext = rbo + (X_D / D) * p^D
    min_mult = ((1.0 - p) / p
                * (math.log(1.0 / (1.0 - p))
                   - sum(p ** d / d for d in range(1, depth + 1))))
    ext_mult = p ** depth / depth
    rbo = (F.lit(1.0) - F.lit(float(p))) * F.col("s") / F.lit(1e15)
    return agg.select(F.lit(float(p)).alias("p"),
                      F.lit(depth).alias("depth"),
                      F.round(rbo, 6).alias("rbo"),
                      F.round(rbo + F.lit(min_mult) * F.col("xk"), 6)
                      .alias("rbo_min"),
                      F.round(rbo + F.lit(ext_mult) * F.col("xk"), 6)
                      .alias("rbo_ext"))


def expected_calibration_error(df: DataFrame, score_col: str, label,
                               bins: int = 10) -> DataFrame:
    """One row (n, bins, ece, mce): Expected / Maximum Calibration
    Error (Naeini et al. 2015) — the scalar the reliability table
    (calibration_table) plots and the isotonic fit repairs: ECE =
    sum_b (n_b/N)·|frac_pos_b − mean_score_b|, MCE = max_b |·|. Same
    one-bin-aggregate shape; per-bin gaps are exact-int-ratio minus
    quantized mean differences, 1e-12-quantized before the weighted
    sum so the scalar is partitioning-invariant."""
    d = df.select(F.col(score_col).alias("_s"),
                  label.cast("boolean").alias("_y"))
    b = F.least(F.lit(bins - 1),
                F.floor(F.col("_s") * bins).cast("int"))
    per = (d.withColumn("_b", b)
           .groupBy("_b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_y").cast("long")).alias("pos"),
                F.sum(F.round(F.col("_s") * F.lit(1e6), 0).cast("long"))
                .alias("sq")))
    gap = F.abs(F.col("pos") / F.col("n")
                - F.col("sq") / F.lit(1e6) / F.col("n"))
    q = F.lit(1e12)
    gq = F.round(gap * q, 0).cast("long")
    agg = per.agg(F.sum("n").alias("n_tot"),
                  F.sum(F.col("n") * gq).alias("wsum"),
                  F.max(gq).alias("mx"))
    return agg.select(F.col("n_tot").alias("n"),
                      F.lit(bins).alias("bins"),
                      F.round(F.col("wsum") / F.col("n_tot") / q, 6)
                      .alias("ece"),
                      F.round(F.col("mx") / q, 6).alias("mce"))


def kendall_tau_b(df: DataFrame, col_a: str, col_b: str,
                  max_cells: int = 4_000) -> DataFrame:
    """One row (n, n_cells, tau_b): exact Kendall tau-b rank
    correlation with full tie corrections — computed from the JOINT
    CONTINGENCY of the two columns, never from row pairs: concordant
    minus discordant mass is sum over cell pairs of n1*n2*sign, so
    the work is cells² while the data contributes one groupBy.
    ``max_cells`` bounds the DISTINCT-CELL count directly (the pair
    join below is a non-equi nested loop, so even a few thousand
    cells is already ~10^7 comparisons — quantize continuous columns
    upstream). All integer until the final ratio, so the statistic is
    bit-exact cross-engine — the tau companion to the Spearman and
    Pearson coefficients here.

    .. note:: CHANGED in r10: ``max_cells`` default tightened from
       100_000 to 4_000 (100k cells meant 10^10 nested-loop
       comparisons — minutes of one-core work that looked like a
       hang). Inputs with 4k-100k distinct cells that computed under
       the old default now raise by default; pass
       ``max_cells=100_000`` explicitly to restore the old bound, or
       bin the columns upstream (preferred — tau-b on a quantized
       contingency is the intended scale shape)."""
    cells = (df.where(F.col(col_a).isNotNull()
                      & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("x"), F.col(col_b).alias("y"))
             .agg(F.count(F.lit(1)).alias("c")))
    n_cells = cells.count()
    if n_cells > max_cells:
        raise ValueError(
            f"kendall_tau_b: {n_cells} distinct cells -> {n_cells**2} "
            f"cell pairs exceeds the {max_cells}-cell guard; bin the "
            f"columns upstream")
    a = cells.select(F.col("x").alias("x1"), F.col("y").alias("y1"),
                     F.col("c").alias("c1"))
    b2 = cells.select(F.col("x").alias("x2"), F.col("y").alias("y2"),
                      F.col("c").alias("c2"))
    pairs = a.join(b2, (F.col("x1") < F.col("x2"))
                   | ((F.col("x1") == F.col("x2"))
                      & (F.col("y1") < F.col("y2"))))
    sgn = (F.when((F.col("x1") < F.col("x2"))
                  & (F.col("y1") < F.col("y2")), 1)
           .when((F.col("x1") < F.col("x2"))
                 & (F.col("y1") > F.col("y2")), -1)
           .otherwise(0).cast("long"))
    cd = pairs.agg(F.sum(sgn * F.col("c1") * F.col("c2"))
                   .alias("num"))
    margx = (cells.groupBy("x").agg(F.sum("c").alias("m"))
             .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("tx")))
    margy = (cells.groupBy("y").agg(F.sum("c").alias("m"))
             .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("ty")))
    tot = cells.agg(F.sum("c").alias("n"))
    j = (cd.crossJoin(F.broadcast(margx)).crossJoin(F.broadcast(margy))
         .crossJoin(F.broadcast(tot)))
    n0 = (F.col("n") * (F.col("n") - 1)).cast("double")
    tau = (F.lit(2.0) * F.col("num")
           / F.sqrt((n0 - F.col("tx")) * (n0 - F.col("ty"))))
    return j.select(F.col("n"), F.lit(n_cells).alias("n_cells"),
                    F.round(tau, 6).alias("tau_b"))
