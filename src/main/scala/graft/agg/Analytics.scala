package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's analytic query surface (A1–A7) — the SQL layer of
  * database_handler.py:409-480, streamlit.py:19-55 and the denormalized
  * aggregate tables of database_handler.py:112-164 — as parameterized
  * DataFrame aggregations.
  *
  * All are hash aggregates: Spark plans partial (map-side) + final
  * aggregation automatically, so each shuffles `|groups|`-sized partial
  * states, not rows — the shape that survives a 100× scale-up.
  *
  * **Money aggregation policy**: `SUM(double)` is partition-order
  * dependent, so at cluster scale two runs of the same query can disagree
  * in the last ulps. Money sums/averages therefore aggregate on
  * `DECIMAL(18,6)` (exact, associative — the reference's warehouse also
  * stores money as `DECIMAL`, database_handler.py:83-103) and surface as
  * doubles. This is also what makes results reproducible against any
  * external oracle. Scale 6 is chosen so a product of three 2dp factors
  * (price × (1−disc) × (1+tax)) is *exactly* representable: the cast then
  * never rounds, sidestepping engine-specific double→decimal tie-breaking.
  */
object Analytics {

  private val Money = DecimalType(18, 6)

  /** Exact, order-independent sum of a double money column. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Exact-sum-based average (double division as the final step only). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** A1 — global trip statistics (database_handler.py:416-426;
    * streamlit.py:38-48): one-row scalar aggregate over the (optionally
    * pre-filtered) fact table.
    */
  def tripStatistics(df: DataFrame, fare: Column): DataFrame = df.agg(
    count(lit(1)).as("total_trips"),
    davg(fare).as("avg_fare"),
    dsum(fare).as("total_revenue"),
    min(fare).as("min_fare"),
    max(fare).as("max_fare"))

  /** A2 — vendor comparison (database_handler.py:456-467): grouped
    * aggregate + ORDER BY vendor.
    */
  def vendorComparison(df: DataFrame, vendor: Column, fare: Column): DataFrame =
    df.groupBy(vendor.as("vendor_id")).agg(
        count(lit(1)).as("total_trips"),
        davg(fare).as("avg_fare"),
        dsum(fare).as("total_revenue"))
      .orderBy("vendor_id")

  /** A3 — date-range discovery (streamlit.py:21): MIN/MAX of the event
    * time. Emitted as ISO date strings + integer epoch-seconds so the
    * values are exact across engines regardless of sub-second precision
    * or date-type physical encodings.
    */
  def dateBounds(df: DataFrame, ts: Column): DataFrame = df.agg(
    date_format(min(ts), "yyyy-MM-dd").as("min_date"),
    date_format(max(ts), "yyyy-MM-dd").as("max_date"),
    unix_timestamp(min(ts)).as("min_ts_sec"),
    unix_timestamp(max(ts)).as("max_ts_sec"))

  /** A5 — conditional/pivoted counts (database_handler.py:124-128): the
    * denormalized one-row summary (`vendor_1_trips`, `short_trips`, …)
    * generalized to any named predicate list. Compiles to
    * `sum(when(cond,1))` — a single scan pass, no pivot shuffle.
    */
  def conditionalCounts(df: DataFrame, conds: Seq[(String, Column)]): DataFrame = {
    val aggs = conds.map { case (name, cond) =>
      sum(when(cond, 1L).otherwise(0L)).as(name) }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A6 — hourly statistics (database_handler.py:152-164): per
    * `analysis_date` × `hour_of_day` counts/averages/revenue.
    */
  def hourlyStatistics(df: DataFrame, ts: Column, fare: Column): DataFrame =
    // Group on the native date value and render the ISO string after
    // aggregation: formatting runs once per group, not once per row.
    df.groupBy(to_date(ts).as("d"), hour(ts).as("hour_of_day"))
      .agg(
        count(lit(1)).as("trip_count"),
        davg(fare).as("avg_fare"),
        dsum(fare).as("total_revenue"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("analysis_date"),
        col("hour_of_day"), col("trip_count"), col("avg_fare"),
        col("total_revenue"))
      .orderBy("analysis_date", "hour_of_day")

  /** A7 — vendor-daily performance (database_handler.py:135-148): per
    * vendor × date trips/averages/revenue.
    */
  def vendorDaily(df: DataFrame, vendor: Column, ts: Column, fare: Column): DataFrame =
    df.groupBy(vendor.as("vendor_id"), to_date(ts).as("d"))
      .agg(
        count(lit(1)).as("total_trips"),
        davg(fare).as("avg_fare"),
        dsum(fare).as("total_revenue"))
      .select(col("vendor_id"),
        date_format(col("d"), "yyyy-MM-dd").as("analysis_date"),
        col("total_trips"), col("avg_fare"), col("total_revenue"))
      .orderBy("vendor_id", "analysis_date")
}
