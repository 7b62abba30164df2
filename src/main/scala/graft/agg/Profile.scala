package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling and data-quality operators: the inspection pass a
  * warehouse runs over every new table before trusting it (the reference
  * pipeline trusts its producer schema blindly — `data_generator.py`
  * emits and `spark_consumer.py` consumes with no profiling step; this
  * module is the missing guardrail, generalized).
  *
  * Determinism contract (shared with the rest of the engine): every
  * money/measure sum aggregates on DECIMAL(18,6) before the final double
  * cast, so results are partition-order exact and hash-comparable with
  * the DuckDB oracle; derived doubles (mean, variance) are computed from
  * those exact decimal sums with a FIXED expression tree, so both
  * engines perform the identical IEEE-754 operation sequence.
  */
object Profile {

  private val Money = "decimal(18,6)"
  /** (18,6)² → (37,12): exact squares for sum-of-squares accumulation. */
  private val Money2 = "decimal(38,12)"

  /** One-pass column profile: for each requested numeric column, its row
    * count, non-null count, exact distinct count, min, max and exact
    * decimal sum — one output row per column.
    *
    * Plan shape: a SINGLE aggregate over one scan. Multiple exact
    * COUNT(DISTINCT) in one aggregate plan through Catalyst's Expand
    * (row ×(k+1) replication before the partial aggregate) — the honest
    * cost of exactness; a 100 TB profile would flip `n_distinct` to
    * approx_count_distinct and drop the Expand, trading the oracle's
    * exact-match for one narrow scan. The per-column stacking happens on
    * the one aggregated row (explode of a k-element array — driver-free,
    * constant cost).
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__rows"),
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(Money)).cast("double").as(s"${c}__sum"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nonnull").as("n_nonnull"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"),
        col(s"${c}__sum").as("sum_v"))
    }: _*)).as("p"))
    stacked.select("p.*").orderBy("col_name")
  }

  /** Per-group z-score outlier screen with EXACT moments: rows whose
    * |v − mean| exceeds z·sd of their group, counted per group.
    *
    * Two aggregates, zero wide shuffles of the fact table beyond the
    * group-keyed one: pass 1 reduces each group to (n, Σv, Σv²) on
    * decimals (exact, order-independent); the handful of group rows
    * broadcast-join back into pass 2's scan. Mean and sample variance
    * are then derived in DOUBLE from those exact sums with a fixed
    * expression tree — identical bit results on any engine, so the
    * outlier comparison never flips on fold order. (The naive
    * stddev_samp-based form is not hash-stable across engines; this
    * formulation is.)
    */
  def outliersByGroup(df: DataFrame, group: Column, value: Column,
                      z: Double): DataFrame = {
    val v = df.select(group.as("g"), value.as("v"))
    val stats = v.groupBy("g").agg(
      count(col("v")).as("n"),
      sum(col("v").cast(Money)).as("s"),
      sum((col("v").cast(Money) * col("v").cast(Money)).cast(Money2)).as("s2"))
    // mean = s/n; var = (s2 − s²/n)/(n−1), computed in double from the
    // exact decimal sums — the same literal tree the oracle SQL uses.
    val mean = stats("s").cast("double") / stats("n")
    val variance = (col("s2").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")) /
      (col("n") - lit(1))
    val enriched = stats.select(col("g"), col("n"),
      mean.as("mean_v"), sqrt(variance).as("sd_v"))
    v.join(broadcast(enriched), "g")
      .filter(abs(col("v") - col("mean_v")) > lit(z) * col("sd_v"))
      .groupBy("g").agg(count(lit(1)).as("n_outliers"))
      .join(broadcast(enriched.select("g", "n")), "g")
      .select(col("g"), col("n"), col("n_outliers"))
      .orderBy("g")
  }

  /** Gaps-and-islands run collapse (the SCD-2 / sessionless dwell
    * shape): each user's time-ordered event stream is split into maximal
    * runs of the SAME event type, emitting one interval row per run with
    * its bounds and length.
    *
    * One window partitioning (user) serves both the change detector
    * (lag) and the run counter (running sum) — a single sort-based
    * shuffle keyed on the user, then a hash aggregate on (user, run).
    * Ties are broken by a caller-supplied unique id so run boundaries
    * are deterministic under any partitioning.
    */
  def eventRuns(events: DataFrame, tsUs: Column, user: Column,
                eventType: Column, tieBreak: Column): DataFrame = {
    val ev = events.select(user.as("u"), eventType.as("et"),
      tsUs.as("tu"), tieBreak.as("tb"))
    val w = Window.partitionBy("u").orderBy("tu", "tb")
    val runs = ev
      .withColumn("chg",
        when(lag("et", 1).over(w).isNull ||
          lag("et", 1).over(w) =!= col("et"), 1L).otherwise(0L))
      .withColumn("run_id", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy("u", "run_id")
      .agg(first("et").as("et"), min("tu").as("valid_from"),
        max("tu").as("valid_to"), count(lit(1)).as("n_events"))
      .select(col("u"), col("run_id"), col("et"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy("u", "run_id")
  }

  /** Calendar gap-fill: the per-(key, day) count series with MISSING
    * days materialized as explicit zero rows — the densification step
    * every time-series chart/model needs and sparse storage omits.
    *
    * The fact table is aggregated FIRST (one group-keyed shuffle down to
    * |keys|·|days| rows); the dense grid is built from one 1-row bounds
    * aggregate exploded through `sequence()` and cross-joined with the
    * distinct keys — both sides tiny and broadcast, so the final left
    * join never reshuffles anything fact-sized. Grid size is
    * days × keys: bounded by the calendar, not the data.
    */
  def gapFillDaily(df: DataFrame, key: Column, date: Column): DataFrame = {
    val facts = df.select(key.as("k"), date.as("d"))
    val counts = facts.groupBy("k", "d").agg(count(lit(1)).as("n"))
    val days = facts.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("d"))
    val grid = days.crossJoin(facts.select(col("k")).distinct())
    grid.join(broadcast(counts), Seq("k", "d"), "left")
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("k", "day")
  }
}
