package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event stream: conversion funnels,
  * cohort retention, and event-transition (bigram) matrices — the query
  * family a product-analytics warehouse layers over the same clickstream
  * the reference pipelines into Postgres (events ≈ `taxi_trips` rows;
  * the aggregates ≈ `database_handler.py:112-164`'s denormalized tables,
  * generalized from per-hour counts to per-user sequences).
  *
  * Scale shape: every operator here is keyed on `user_id` — the funnel's
  * three stage joins, the cohort's first-event window, and the
  * transition lag all hash-partition on the user, so a 1000-executor run
  * shuffles each event at most twice and never materializes a per-user
  * sequence on the driver. Time arithmetic is integer µs (epoch_us on
  * both engines) — no double rounding in group keys.
  */
object Behavior {

  /** Ordered conversion funnel: how many users reach each stage, where a
    * stage counts only if it happens strictly AFTER the user's earliest
    * previous-stage event (the standard funnel semantic — a purchase
    * before the first view is not a conversion).
    *
    * Two-pass conditional aggregation, one hash shuffle per stage, all
    * on the same `user_id` key (Catalyst reuses the partitioning across
    * the chained joins): stage N's earliest qualifying time = min ts of
    * `stages(N)` events later than stage N−1's time. No windows over the
    * full stream, no per-user sort.
    */
  def funnel(events: DataFrame, tsUs: Column, user: Column,
             eventType: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(user.as("u"), eventType.as("et"), tsUs.as("tu"))
    // reachedAt(i): DataFrame(u, t_i) — users that reached stage i, with
    // the earliest time they did so having done all prior stages in order.
    val first = ev.filter(col("et") === stages.head)
      .groupBy("u").agg(min("tu").as("t0"))
    val reached = stages.zipWithIndex.tail.foldLeft(Seq(first)) {
      case (acc, (stage, i)) =>
        val prev = acc.last
        acc :+ ev.filter(col("et") === stage)
          .join(prev.select(col("u"), col(s"t${i - 1}")), "u")
          .filter(col("tu") > col(s"t${i - 1}"))
          .groupBy("u").agg(min("tu").as(s"t$i"))
    }
    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("stage_name"),
          col("n_users"))
    }
    counts.reduce(_.union(_)).orderBy("stage")
  }

  /** Weekly cohort retention: users bucketed by the week of their FIRST
    * event; each (cohort week, weeks-since-cohort) cell counts the
    * distinct users active that week. Weeks are integer epoch-µs
    * divisions (UTC, week 0 = 1970-01-01) — exact on any engine.
    *
    * One window (min over the user partition) + one distinct aggregate:
    * both shuffles key on `user_id` / the cohort cell; per-row state is
    * O(1). The classic formulation joins a first-event dimension back to
    * the stream — the window form fuses that join into the same shuffle.
    */
  def cohortRetention(events: DataFrame, tsUs: Column,
                      user: Column): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // Integral `div`, not `/`: long/long division in Spark is double
    // division, and doubles stop being exact integers past 2^53 (ns-epoch
    // magnitudes). Timestamps are non-negative, so div == floor.
    val ev = events.select(user.as("u"), tsUs.cast("long").as("tu"))
      .withColumn("wk", expr(s"tu div ${weekUs}L")).drop("tu")
    val w = Window.partitionBy("u")
    ev.withColumn("cohort_wk", min("wk").over(w))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct("u").as("n_active"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** Event-transition bigram matrix: for each user's time-ordered event
    * sequence, count (event, next event) pairs — the Markov-chain view
    * of the stream (drop-off edges, loop detection). One lag window and
    * one hash aggregate; ties broken by a caller-supplied unique id so
    * the sequence — and therefore the counts — are deterministic under
    * any partitioning.
    */
  def transitions(events: DataFrame, tsUs: Column, user: Column,
                  eventType: Column, tieBreak: Column): DataFrame = {
    val ev = events.select(user.as("u"), eventType.as("et"),
      tsUs.as("tu"), tieBreak.as("tb"))
    val w = Window.partitionBy("u").orderBy("tu", "tb")
    ev.withColumn("next_et", lead("et", 1).over(w))
      .filter(col("next_et").isNotNull)
      .groupBy(col("et").as("from_type"), col("next_et").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Winsorized money statistics: clamp a value column to its exact
    * [pLo, pHi] percentiles, then aggregate — the outlier-robust sum/avg
    * a feature store computes before normalizing. Two passes over the
    * column (exact percentiles cannot stream), but pass 1 reduces to ONE
    * row that broadcasts into pass 2's scan — no shuffle of the fact
    * table at all. Percentile uses linear interpolation on the sorted
    * column (rank = p·(n−1)), the same contract as SQL PERCENTILE_CONT /
    * DuckDB quantile_cont; the clamped sum aggregates on DECIMAL(18,6)
    * (see [[Analytics.dsum]]) so the result is partition-order exact.
    */
  def winsorizedStats(df: DataFrame, value: Column,
                      pLo: Double, pHi: Double): DataFrame = {
    val v = df.select(value.as("v"))
    val bounds = v.agg(
      expr(s"percentile(v, $pLo)").as("lo"),
      expr(s"percentile(v, $pHi)").as("hi"))
    val clamped = v.crossJoin(broadcast(bounds))
      .select(least(greatest(col("v"), col("lo")), col("hi")).as("cv"))
    clamped.agg(
      count(lit(1)).as("n"),
      Analytics.dsum(col("cv")).as("w_sum"),
      Analytics.davg(col("cv")).as("w_avg"),
      min("cv").as("w_min"),
      max("cv").as("w_max"))
  }

  /** EXACT trailing-`window`-day distinct actives per day (the DAU/WAU
    * engagement metric). Sliding distinct does not decompose, so the
    * scalable exact form replicates each DISTINCT (day, user) pair to
    * the `window` target days it supports — one explode of a
    * `sequence()` literal (×window rows of two columns) and one
    * count-distinct shuffle keyed by day. The fact table itself is
    * touched once; days past the data's horizon are clipped via a
    * broadcast 1-row max. At 100 TB the ×7 blowup applies to the
    * (day, user) DISTINCT frame — orders of magnitude smaller than the
    * event stream — not to the facts.
    */
  def rollingDistinctUsers(events: DataFrame, ts: Column, user: Column,
                           window: Int = 7): DataFrame = {
    val du = events.select(to_date(ts).as("day"), user.as("u")).distinct()
    val hi = du.agg(max(col("day")).as("hi"))
    du.select(explode(sequence(lit(0), lit(window - 1))).as("off"),
        col("day"), col("u"))
      .select(date_add(col("day"), col("off")).as("day"), col("u"))
      .crossJoin(broadcast(hi))
      .filter(col("day") <= col("hi"))
      .groupBy("day")
      .agg(countDistinct(col("u")).as(s"users_${window}d"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col(s"users_${window}d"))
      .orderBy("day")
  }

  /** The sketch path for [[rollingDistinctUsers]] at scale: ONE HLL
    * sketch per day (a few KB), then `hll_union_agg` over a trailing
    * RANGE frame on the day NUMBER — calendar-correct even when days
    * are missing from the data (a trailing ROWS frame would silently
    * widen the "7-day" window across the gap). Estimate, not exact
    * (ScalaTest pins <5 % error against the exact form); mergeability
    * is what buys the re-scan-free property, same trade as
    * `hll_vocab_rollup`.
    *
    * Row-set caveat vs the exact twin: this form emits one row per day
    * PRESENT in the data, while [[rollingDistinctUsers]] also emits
    * trailing gap days still supported by earlier events. Union a day
    * scaffold (as `gapFillDaily` does) before the window if the
    * downstream needs the dense calendar.
    */
  def rollingDistinctUsersHll(events: DataFrame, ts: Column, user: Column,
                              window: Int = 7): DataFrame = {
    val daily = events.select(to_date(ts).as("day"), user.as("u"))
      .groupBy("day").agg(hll_sketch_agg(col("u"), lit(12)).as("sk"))
      .withColumn("dn", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy("dn").rangeBetween(-(window - 1), 0)
    daily
      .select(col("day"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)).over(w))
          .as(s"est_users_${window}d"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col(s"est_users_${window}d"))
      .orderBy("day")
  }
}
