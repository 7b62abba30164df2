package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal relational operators Spark has no built-in form of — as-of
  * join, gaps-and-islands sessionization, and tolerance (interval) join.
  * The reference has no joins at all (SURVEY §2.4), so these are engine
  * capability; each is expressed as composed built-ins chosen for the
  * plan Spark executes at scale, per SURVEY §7.3 tier (a).
  *
  * Scale design notes per operator are on the methods; the common theme:
  * never formulate a temporal join as an inequality theta-join (which
  * Catalyst can only execute as broadcast-nested-loop/cartesian) — use a
  * shuffle that carries an equi-key (the group key, or a time bucket) so
  * cost tracks matches, not |L|·|R|.
  */
object Temporal {

  /** Backward as-of join: for every left row, the most recent right row
    * with `rightTs <= leftTs` in the same `key` group (SQL ASOF JOIN
    * semantics). Nulls when no right row precedes.
    *
    * Implemented WITHOUT a join: both sides union into one stream, one
    * hash shuffle on the key, one sort per group, and a running
    * last-non-null window picks each left row's predecessor. At 100 TB
    * this costs a single shuffle of both inputs on the key — the
    * inequality-join formulation Spark would otherwise pick degenerates
    * to a per-key cartesian.
    *
    * Determinism: among right rows sharing (key, rightTs), the one with
    * the greatest `rightTie` wins (pass a unique column). Right rows
    * order before left rows at equal timestamps, giving `<=` semantics.
    *
    * Output: every left column, plus `rightTs`/`rightTie`/`rightPayload`
    * prefixed with `outPrefix`.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, rightTie: String,
                       rightPayload: Seq[String],
                       outPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightTie, rightPayload,
      outPrefix, forward = false)

  /** Forward as-of join: the EARLIEST right row with `rightTs >= leftTs`
    * in the key group — same single-shuffle union+window mechanics as
    * [[asofJoinBackward]], scanning time descending. Among right rows
    * sharing (key, rightTs), the smallest `rightTie` wins.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, rightTie: String,
                      rightPayload: Seq[String],
                      outPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightTie, rightPayload,
      outPrefix, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, rightTie: String,
                       rightPayload: Seq[String], outPrefix: String,
                       forward: Boolean): DataFrame = {
    val payloadCols = (Seq(rightTs, rightTie) ++ rightPayload).distinct
    val leftStructType = StructType(left.schema.fields)
    val rightSide = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      col(rightTie).as("__tie"),
      struct(payloadCols.map(col): _*).as("__p"),
      lit(null).cast(leftStructType).as("__l"))
    val leftSide = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(right.schema(rightTie).dataType).as("__tie"),
      lit(null).cast(rightSide.schema("__p").dataType).as("__p"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"))
    // Backward: scan time ascending, running last-non-null = latest
    // right at-or-before; ties broken to the LARGEST tie (last in asc
    // tie order). Forward: scan time descending, running last-non-null
    // = earliest right at-or-after; ties to the SMALLEST tie (last in
    // desc tie order). In both, right rows sort before left rows at the
    // same timestamp — the bound is inclusive. Left rows carry a null
    // tie; their relative order is irrelevant (every permutation sees
    // the same right rows before them).
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side"), col("__tie").desc)
      else Seq(col("__ts"), col("__side"), col("__tie"))
    val w = Window.partitionBy("__k")
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        payloadCols.map(c => col(s"__asof.`$c`").as(s"$outPrefix$c")): _*)
  }

  /** Gaps-and-islands sessionization: rows of `df` (which must carry
    * `key`, a µs-epoch `tsUs` column, and a unique `tie` column) are
    * grouped into sessions whose internal gaps never exceed `gapUs`.
    * Output: one row per (key, session) with start/end/size.
    *
    * One shuffle on the key; both windows and the final aggregate reuse
    * the same hash partitioning, so Catalyst plans a single Exchange.
    * This is the batch twin of the streaming
    * [[graft.stream.Pipeline.sessionize]] (flatMapGroupsWithState) — same
    * session definition, verifiable against a SQL oracle.
    */
  def sessionize(df: DataFrame, key: String, tsUs: String, tie: String,
                 gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(key).orderBy(tsUs, tie)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsUs), 1).over(ord)
    df.withColumn("__new",
        when(prev.isNull || col(tsUs) - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(key), col("session_id"))
      .agg(min(col(tsUs)).as("session_start_us"),
        max(col(tsUs)).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Tolerance (interval) join: all (left, right) pairs with
    * `|leftTsUs − rightTsUs| <= tolUs`, with NO equi-key. The naive
    * theta-join is a cartesian; bucketing time by `tolUs` manufactures
    * an equi-key — a pair within tolerance is always in the same or
    * adjacent buckets, so the right side replicates into its 3
    * neighboring buckets (bounded 3× fan-out), the join shuffles on the
    * bucket, and the exact predicate filters the survivors. Cost tracks
    * collisions per time bucket, not |L|·|R|.
    *
    * Inputs must each expose the named µs-epoch column; all other
    * columns pass through (left's then right's — disambiguate names
    * before calling).
    */
  /** Point-in-interval range join: all (point, interval) pairs with
    * `lo <= point <= hi`, intervals of VARYING width and NO equi-key —
    * the general form [[toleranceJoin]] is the symmetric special case
    * of. Spark plans the naive `BETWEEN` theta-join as a broadcast
    * nested loop (|P|·|I| comparisons); bucketing manufactures the
    * equi-key: each interval explodes into every `bucketWidth`-wide
    * bucket it touches (`sequence(bucket(lo), bucket(hi))`), each point
    * carries its single bucket, the join shuffles on the bucket, and
    * the exact predicate filters survivors. A qualifying pair meets in
    * EXACTLY one bucket (the point's), so no distinct pass is needed.
    *
    * Cost: interval fan-out is `width/bucketWidth + 1` rows — pick
    * `bucketWidth` near the typical interval width so fan-out is ~2 and
    * a bucket's population bounds the per-task work (AQE splits skewed
    * buckets). Intervals with `hi < lo` match nothing (as with
    * BETWEEN) and are dropped before the explode — `sequence` would
    * otherwise walk them DESCENDING and emit phantom buckets.
    *
    * `pointCol`, `loCol`, `hiCol` name integral (e.g. epoch) columns;
    * all other columns pass through (points' then intervals' —
    * disambiguate names before calling).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    // Exact integer floor-division (the toleranceJoin rationale: double
    // floor mis-buckets beyond 2^53).
    def bucket(c: String) =
      expr(s"(`$c` - pmod(`$c`, ${bucketWidth}L)) div ${bucketWidth}L")
    val pb = points.withColumn("__b", bucket(pointCol))
    val ib = intervals.filter(col(hiCol) >= col(loCol))
      .withColumn("__b", explode(sequence(bucket(loCol), bucket(hiCol))))
    pb.join(ib, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  def toleranceJoin(left: DataFrame, right: DataFrame,
                    leftTsUs: String, rightTsUs: String,
                    tolUs: Long): DataFrame = {
    // Exact integer floor-division: `floor(col / tol)` divides in double
    // and mis-floors once |ts| exceeds 2^53 (e.g. ns-epoch magnitudes),
    // which can strand a within-tolerance pair in non-adjacent buckets.
    // Subtracting pmod makes the value an exact floor multiple, and
    // integral `div` of an exact multiple is the floor at any magnitude.
    def bucket(c: String) =
      expr(s"(`$c` - pmod(`$c`, ${tolUs}L)) div ${tolUs}L")
    val lb = left.withColumn("__b", bucket(leftTsUs))
    val rBucket = bucket(rightTsUs)
    val rb = right.withColumn("__b",
      explode(array(rBucket - 1, rBucket, rBucket + 1)))
    lb.join(rb, "__b")
      .filter(abs(col(leftTsUs) - col(rightTsUs)) <= tolUs)
      .drop("__b")
  }
}
