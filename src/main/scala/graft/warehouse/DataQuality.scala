package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations shape):
  * a suite of named constraints compiled into the FEWEST possible scans,
  * reported as one small (check, tbl, n_rows, violations, pass) frame.
  *
  * Scale discipline: every predicate check on the same table fuses into
  * ONE conditional aggregate — auditing ten constraints on a 100-TB
  * fact table costs a single scan, not ten. Referential checks are the
  * only joins (left-anti count per FK edge) and shuffle just the key
  * columns. The report itself is a union of 1-row frames — bytes.
  */
object DataQuality {

  /** One predicate constraint: `violations = count(rows failing pred)`. */
  final case class RuleCheck(name: String, pred: Column)

  /** All predicate checks for one table in a single scan/aggregate:
    * one conditional-sum row, EXPLODED into per-check report rows (a
    * union of per-check selects would re-plan the aggregate per branch
    * — map+explode keeps the static plan at exactly one scan).
    */
  def checkTable(df: DataFrame, tbl: String, checks: Seq[RuleCheck]): DataFrame = {
    // coalesce: SUM over zero rows is NULL — an EMPTY table must audit
    // as 0 violations / pass, not as a NULL report row.
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map(c =>
        coalesce(sum(when(c.pred, 1L).otherwise(0L)), lit(0L)).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kv = checks.flatMap(c => Seq(lit(c.name), col(c.name)))
    one.select(col("n_rows"),
        explode(map(kv: _*)).as(Seq("check", "violations")))
      .select(col("check"), lit(tbl).as("tbl"), col("n_rows"),
        col("violations"))
  }

  /** Uniqueness constraint: duplicate instances of `key` (rows beyond
    * the first per key). One hash aggregate on the key column only.
    */
  def checkUnique(df: DataFrame, tbl: String, key: Column,
                  name: String): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum("c"), lit(0L)).as("n_rows"),
        coalesce(sum(col("c") - lit(1L)), lit(0L)).as("violations"))
      .select(lit(name).as("check"), lit(tbl).as("tbl"),
        col("n_rows"), col("violations"))

  /** Referential-integrity constraint: child keys with no parent.
    * Left-anti join on the key columns only (everything else pruned
    * before the exchange); the parent side deduplicates to its key set
    * first so the join's build side is as small as the dimension's
    * cardinality.
    */
  def checkFk(child: DataFrame, tbl: String, childKey: Column,
              parent: DataFrame, parentKey: Column,
              name: String): DataFrame = {
    val c = child.select(childKey.as("k"))
    val p = parent.select(parentKey.as("k")).distinct()
      .withColumn("present", lit(1))
    c.join(p, Seq("k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("present").isNull, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(name).as("check"), lit(tbl).as("tbl"),
        col("n_rows"), col("violations"))
  }

  /** The engine's standing audit over the warehouse tables: schema-key
    * uniqueness, FK edges, null/NaN guards, and domain ranges. Returns
    * (check, tbl, n_rows, violations, pass) ordered by (tbl, check).
    */
  def audit(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
            events: DataFrame): DataFrame = {
    val reports = Seq(
      checkTable(lineitem, "lineitem", Seq(
        RuleCheck("qty_in_range",
          col("l_quantity") <= 0 || col("l_quantity") > 50),
        RuleCheck("discount_in_unit",
          col("l_discount") < 0 || col("l_discount") > 1),
        RuleCheck("price_positive", col("l_extendedprice") <= 0))),
      checkTable(orders, "orders", Seq(
        RuleCheck("total_positive", col("o_totalprice") <= 0),
        RuleCheck("status_known",
          !col("o_orderstatus").isin("O", "F", "P")))),
      checkTable(events, "events", Seq(
        RuleCheck("value_not_null", col("value").isNull),
        RuleCheck("value_not_nan", isnan(col("value"))),
        RuleCheck("props_not_null", col("props").isNull))),
      checkUnique(orders, "orders", col("o_orderkey"), "pk_unique"),
      checkUnique(customer, "customer", col("c_custkey"), "pk_unique"),
      checkFk(lineitem, "lineitem", col("l_orderkey"),
        orders, col("o_orderkey"), "fk_orders"),
      checkFk(orders, "orders", col("o_custkey"),
        customer, col("c_custkey"), "fk_customer"))
    reports.reduce(_.union(_))
      .select(col("check"), col("tbl"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy("tbl", "check")
  }
}
