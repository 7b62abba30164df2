package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analytics beyond the reference's COUNT/AVG/SUM surface
  * (`database_handler.py:416-426` stops at first moments): bivariate
  * regression/correlation, rolling-window statistics, time-weighted
  * averages, and share-of-total ratios — the standard warehouse stats
  * toolkit, built so every answer is bit-identical across engines.
  *
  * Determinism policy (same contract as [[Analytics]]): every aggregate
  * that feeds a formula is an exact DECIMAL sum (order-independent under
  * any partitioning), and the closed-form algebra runs in double as the
  * final step only, with the identical expression tree mirrored in the
  * DuckDB oracle SQL — IEEE doubles are deterministic given the same
  * inputs and operation order, so hash-match survives any cluster size.
  *
  * Scale shape: one hash-aggregate shuffle each (regression, share) or
  * one window shuffle keyed on the partition column (rolling, TWAP); no
  * driver-side state, no second scan, no cross joins.
  */
object Stats {

  private def d(c: Column): Column = c.cast("double")

  /** Per-group bivariate statistics — Pearson correlation, sample
    * covariance, and the OLS slope/intercept of y on x — computed from
    * the five exact decimal power sums (Σx, Σy, Σx², Σy², Σxy) rather
    * than Spark's built-in `corr`/`covar_samp`, whose streaming double
    * accumulation is fold-order-dependent and therefore violates the
    * hash-match contract. One scan, one partial+final hash aggregate;
    * the shuffle carries six numbers per group.
    *
    * The per-row squares/products are computed in double (deterministic
    * per row) and cast to DECIMAL(28,6) before summing, exactly like
    * [[graft.SparkEntry]]'s `value_moments`.
    */
  def regressionStats(df: DataFrame, group: Column, x: Column, y: Column)
      : DataFrame = {
    val sums = df.groupBy(group.as("grp")).agg(
      count(lit(1)).as("n"),
      sum(x.cast("decimal(18,6)")).as("sx"),
      sum(y.cast("decimal(18,6)")).as("sy"),
      sum((x * x).cast("decimal(28,6)")).as("sxx"),
      sum((y * y).cast("decimal(28,6)")).as("syy"),
      sum((x * y).cast("decimal(28,6)")).as("sxy"))
    val n = d(col("n"))
    val cov = (d(col("sxy")) - d(col("sx")) * d(col("sy")) / n) / (n - lit(1.0))
    val varx = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / n) / (n - lit(1.0))
    val vary = (d(col("syy")) - d(col("sy")) * d(col("sy")) / n) / (n - lit(1.0))
    val slope = cov / varx
    sums.select(col("grp"), col("n"),
        round(cov, 4).as("covar_xy"),
        round(cov / sqrt(varx * vary), 4).as("corr_xy"),
        round(slope, 4).as("slope"),
        round((d(col("sy")) - slope * d(col("sx"))) / n, 4).as("intercept"))
      .orderBy("grp")
  }

  /** Rolling-window statistics over a ROWS frame: for each row, the
    * count / mean / min / max of `value` across the trailing `frame`+1
    * rows of its partition. The mean is an exact decimal sum divided as
    * the final step, so the sliding-sum implementation (Spark's
    * per-frame re-scan vs an oracle's segment tree) cannot change the
    * answer. One window shuffle keyed on the partition column.
    */
  def rollingStats(df: DataFrame, part: Column, order: Column, value: Column,
      frame: Int = 6): DataFrame = {
    val w = Window.partitionBy(part).orderBy(order)
      .rowsBetween(-frame, Window.currentRow)
    df.select(order.as("id"), part.as("part"),
        count(lit(1)).over(w).as("win_n"),
        round(d(sum(value.cast("decimal(18,6)")).over(w)) /
          count(lit(1)).over(w), 4).as("win_avg"),
        round(min(value).over(w), 4).as("win_min"),
        round(max(value).over(w), 4).as("win_max"))
      .orderBy("id")
  }

  /** Time-weighted average value per (key, day): each event's value is
    * weighted by the nanoseconds until the partition's next event (the
    * piecewise-constant integral a monitoring system means by "average
    * over time"), so a burst of rapid readings no longer dominates a sparse
    * hour. The last event of each (key, day) has no forward interval
    * and is excluded — mirroring the oracle exactly.
    *
    * Weights are integer nanoseconds (`tsNs` is the raw parquet ns
    * column — no timestamp rounding), products are value×ns in decimal,
    * so the weighted sum is exact under any fold order. One window
    * shuffle on (key, day) reused by the follow-on aggregate.
    */
  def timeWeightedAvg(df: DataFrame, key: Column, ts: Column, tsNs: Column,
      value: Column): DataFrame = {
    val w = Window.partitionBy("k", "day").orderBy("t", "event_id")
    df.select(key.as("k"), to_date(ts).as("day"), tsNs.as("t"),
        value.as("v"), col("event_id"))
      .withColumn("dur_ns", lead(col("t"), 1).over(w) - col("t"))
      .filter(col("dur_ns").isNotNull && col("dur_ns") > 0)
      .groupBy(col("k").as("user_id"), col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        round(d(sum(col("v").cast("decimal(18,6)") * col("dur_ns"))) /
          d(sum(col("dur_ns"))), 4).as("twap"))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_intervals"), col("twap"))
      .orderBy("user_id", "day")
  }

  /** Welch's two-sample t-test between groups `a` and `b` of one
    * categorical column: t-statistic and Welch–Satterthwaite degrees of
    * freedom, from ONE conditional hash aggregate (six decimal sums on
    * a single scan — no self-join, no second pass). The per-group
    * moments come from exact decimal sums like [[regressionStats]], so
    * the one-row answer is bit-stable under any partitioning.
    */
  def welchTTest(df: DataFrame, group: Column, value: Column,
      a: String, b: String): DataFrame = {
    def cnt(g: String) = count(when(group === g, 1))
    def s1(g: String) =
      sum(when(group === g, value).cast("decimal(18,6)"))
    def s2(g: String) =
      sum(when(group === g, value * value).cast("decimal(28,6)"))
    val sums = df.agg(
      cnt(a).as("na"), s1(a).as("sa"), s2(a).as("qa"),
      cnt(b).as("nb"), s1(b).as("sb"), s2(b).as("qb"))
    def mean(s: String, n: String) = d(col(s)) / d(col(n))
    def vr(q: String, s: String, n: String) =
      (d(col(q)) - d(col(s)) * d(col(s)) / d(col(n))) / (d(col(n)) - lit(1.0))
    val sea = vr("qa", "sa", "na") / d(col("na"))
    val seb = vr("qb", "sb", "nb") / d(col("nb"))
    sums.select(
      lit(a).as("group_a"), lit(b).as("group_b"),
      col("na"), col("nb"),
      round(mean("sa", "na"), 4).as("mean_a"),
      round(mean("sb", "nb"), 4).as("mean_b"),
      round((mean("sa", "na") - mean("sb", "nb")) / sqrt(sea + seb), 4)
        .as("t_stat"),
      round((sea + seb) * (sea + seb) /
        (sea * sea / (d(col("na")) - lit(1.0)) +
         seb * seb / (d(col("nb")) - lit(1.0))), 4).as("welch_df"))
  }

  /** Chi-square test of independence between two categorical columns:
    * observed cell counts from one hash aggregate; row totals, column
    * totals and the grand total via window sums OVER THE CELL FRAME
    * (cardinality = |rows|×|cols| cells, never the fact table); each
    * cell's (o−e)²/e contribution is a per-row double cast to a 12-dp
    * decimal before the final sum, so fold order cannot move the
    * statistic. Returns (chi2, dof, n_cells) as one row.
    *
    * Note: (row, col) combinations with zero observations are absent
    * from the cell frame and contribute nothing (a full-statistic
    * variant would add their expected count e). On dense crosstabs —
    * including the events testdata, where every (type, bucket) cell is
    * populated — the two definitions coincide; the oracle encodes the
    * same observed-cells convention.
    */
  def chiSquare(df: DataFrame, rowCat: Column, colCat: Column): DataFrame = {
    val cells = df.groupBy(rowCat.as("r"), colCat.as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = sum("o").over(Window.partitionBy("r"))
    val ct = sum("o").over(Window.partitionBy("c"))
    val tot = sum("o").over()
    val e = d(rt) * d(ct) / d(tot)
    cells
      .select(col("r"), col("c"), col("o"),
        (((d(col("o")) - e) * (d(col("o")) - e)) / e)
          .cast("decimal(28,12)").as("contrib"))
      .agg(
        round(sum(col("contrib")).cast("double"), 4).as("chi2"),
        ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1))
          .as("dof"),
        count(lit(1)).as("n_cells"))
  }

  /** Share-of-total: per-group exact decimal revenue and its percentage
    * of the all-groups total via an unpartitioned window sum over the
    * already-aggregated frame — the second "shuffle" moves one row per
    * group, not the fact table. Decimal end-to-end until the final
    * ratio.
    */
  def shareOfTotal(df: DataFrame, group: Column, amount: Column): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(sum(amount.cast("decimal(18,6)")).as("rev"))
      .select(col("grp"),
        round(d(col("rev")), 2).as("revenue"),
        round(d(col("rev")) * 100.0 / d(sum(col("rev")).over()), 4)
          .as("pct_of_total"))
      .orderBy("grp")

  /** Per-observation EWMA weights for lag `j`: (1−α)^j, computed once
    * on the driver so Spark and the oracle interpolate the IDENTICAL
    * double literal (Double.toString round-trips exactly).
    */
  def ewmaWeights(alpha: Double, window: Int): IndexedSeq[Double] =
    (0 until window).map(j => math.pow(1.0 - alpha, j))

  /** Bounded exponentially-weighted moving average: for each row, the
    * normalized (1−α)^j-weighted mean of the last `window` observations
    * in the series — the streaming-friendly smoother (an unbounded EWMA
    * is a non-associative recursion; bounding the support at `window`
    * lags makes it a FIXED expression over a ROWS frame, deterministic
    * and window-exchange-free beyond the one partition-by shuffle).
    *
    * The weighted sum folds left-to-right over a fixed lag chain — a
    * single projection, no aggregation — so the double result is the
    * same on every engine evaluating the same tree. Head-of-series rows
    * renormalize over the lags that exist (den omits missing terms).
    */
  def ewmaSmooth(df: DataFrame, part: Column, order: Column,
                 tieBreak: Column, value: Column,
                 alpha: Double = 0.3, window: Int = 8): DataFrame = {
    val ws = ewmaWeights(alpha, window)
    val w = Window.partitionBy("k").orderBy("o", "tb")
    val lags = (0 until window).map(j => lag(col("v"), j).over(w))
    val num = lags.zip(ws).map { case (l, wt) =>
      coalesce(l, lit(0.0)) * lit(wt)
    }.reduce(_ + _)
    val den = lags.zip(ws).map { case (l, wt) =>
      when(l.isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _)
    df.select(part.as("k"), order.as("o"), tieBreak.as("tb"),
        value.as("v"))
      .withColumn("ewma", round(num / den, 4))
      .select(col("k"), col("o"), col("tb"),
        round(col("v"), 4).as("value"), col("ewma"))
      .orderBy("k", "o", "tb")
  }
}
