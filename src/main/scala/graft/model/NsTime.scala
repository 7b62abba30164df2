package graft.model

/** Preimage arithmetic for int64-nanosecond columns derived to µs via
  * `ns div 1000` (the shape [[graft.sources.Tables.load]] produces for
  * parquet TIMESTAMP(NANOS), which Spark cannot read natively).
  *
  * Spark's `div` is IntegralDivide — truncation toward ZERO, not floor.
  * The preimage of a µs value `us` is therefore sign-dependent:
  *
  *   us > 0 : ns ∈ [us·1000,       us·1000 + 999]
  *   us = 0 : ns ∈ [-999,          999          ]
  *   us < 0 : ns ∈ [us·1000 - 999, us·1000      ]
  *
  * Both the optimizer rule ([[graft.plans.PushNanosTimestampPredicates]])
  * and the manual-pushdown helpers ([[graft.etl.Quality]]) derive their
  * ns-domain range bounds from these two functions, so pre-epoch bounds
  * stay exact.
  */
object NsTime {

  /** Smallest ns with `ns div 1000 == us` (truncating division). */
  def minNs(us: Long): Long = us * 1000L - (if (us <= 0L) 999L else 0L)

  /** Largest ns with `ns div 1000 == us` (truncating division). */
  def maxNs(us: Long): Long = us * 1000L + (if (us >= 0L) 999L else 0L)

  /** The µs value Spark's `to_timestamp` yields for an ISO-ish local
    * datetime string (UTC session): exact ns from the parsed value —
    * `toEpochSecond·10⁹ + getNano`, NOT `toEpochMilli` which silently
    * drops sub-millisecond digits — then floor-division to µs. Floor (not
    * truncation) matches Spark's string parse, which keeps the first six
    * fraction digits: the fraction is non-negative even when the epoch
    * second is negative, so digit truncation is a floor in ns space.
    */
  def boundMicros(bound: String): Long = {
    val ldt = java.time.LocalDateTime.parse(bound.replace(' ', 'T'))
    val exactNs =
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano
    Math.floorDiv(exactNs, 1000L)
  }
}
