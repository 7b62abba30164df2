package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Stats
import graft.warehouse.DataQuality
import graft.warehouse.DataQuality.RuleCheck

/** Data-quality audit on fixtures with KNOWN violations (the sf data is
  * clean, so the oracle pins zeros; these fixtures prove the checks
  * actually fire), plus the EWMA lag-chain math by hand.
  */
class DataQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("checkTable fuses predicates into one scan and counts violations") {
    val df = Seq((1L, -5.0), (2L, 10.0), (3L, 200.0)).toDF("id", "qty")
    val out = DataQuality.checkTable(df, "t", Seq(
        RuleCheck("neg", col("qty") < 0),
        RuleCheck("too_big", col("qty") > 100)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSet === Set(("neg", 3L, 1L), ("too_big", 3L, 1L)))
    // One scan: a single Aggregate feeds every check row — the physical
    // plan contains exactly one scan of the input.
    val plan = DataQuality.checkTable(df, "t", Seq(
        RuleCheck("neg", col("qty") < 0),
        RuleCheck("too_big", col("qty") > 100)))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation") || plan.contains("Union"))
  }

  test("checkUnique counts duplicate key instances beyond the first") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = DataQuality.checkUnique(df, "t", col("k"), "pk").collect().head
    assert(r.getLong(2) === 6L)  // n_rows
    assert(r.getLong(3) === 3L)  // (3-1) + (2-1) extra instances
  }

  test("empty tables audit as 0 violations / pass, never NULL") {
    // SUM over zero rows is NULL; an empty table (post-filter, new day,
    // fresh deployment) must report 0 violations and pass = true, not a
    // NULL report row the downstream pass-check trips over.
    val et = Seq.empty[(Long, Double)].toDF("id", "qty")
    val ct = DataQuality.checkTable(et, "t",
      Seq(RuleCheck("neg", col("qty") < 0))).collect().head
    assert(ct.getLong(2) === 0L && !ct.isNullAt(3) && ct.getLong(3) === 0L)
    val cu = DataQuality.checkUnique(et, "t", col("id"), "pk").collect().head
    assert(cu.getLong(2) === 0L && !cu.isNullAt(3) && cu.getLong(3) === 0L)
    val cf = DataQuality.checkFk(et, "t", col("id"),
      Seq(1L).toDF("pk"), col("pk"), "fk").collect().head
    assert(cf.getLong(2) === 0L && !cf.isNullAt(3) && cf.getLong(3) === 0L)
  }

  test("checkFk counts orphans via key-only anti-join") {
    val child = Seq(10L, 11L, 12L, 12L).toDF("fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val r = DataQuality.checkFk(child, "c", col("fk"),
      parent, col("pk"), "fk").collect().head
    assert(r.getLong(2) === 4L && r.getLong(3) === 2L)
  }

  test("audit passes on clean relational fixtures") {
    val orders = Seq((1L, 1L, "O", 10.0), (2L, 2L, "F", 20.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq((1L, 5.0, 0.1, 100.0), (2L, 7.0, 0.0, 50.0))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val customer = Seq(1L, 2L).toDF("c_custkey")
    val events = Seq((1L, 1.0, "{}"), (2L, 2.0, "{}"))
      .toDF("event_id", "value", "props")
    val out = DataQuality.audit(orders, lineitem, customer, events).collect()
    assert(out.length === 12)
    assert(out.forall(_.getBoolean(4)), "all checks should pass")
  }

  test("audit flags seeded violations") {
    val orders = Seq((1L, 1L, "O", -10.0), (1L, 9L, "X", 20.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq((1L, -5.0, 2.0, 0.0), (42L, 7.0, 0.0, 50.0))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val customer = Seq(1L).toDF("c_custkey")
    val events = Seq((1L, Double.NaN, "{}")).toDF("event_id", "value", "props")
    val byCheck = DataQuality.audit(orders, lineitem, customer, events)
      .collect().map(r => (r.getString(1) + "/" + r.getString(0),
        r.getLong(3))).toMap
    assert(byCheck("lineitem/qty_in_range") === 1L)
    assert(byCheck("lineitem/discount_in_unit") === 1L)
    assert(byCheck("lineitem/price_positive") === 1L)
    assert(byCheck("orders/total_positive") === 1L)
    assert(byCheck("orders/status_known") === 1L)
    assert(byCheck("orders/pk_unique") === 1L)
    assert(byCheck("orders/fk_customer") === 1L)
    assert(byCheck("lineitem/fk_orders") === 1L)
    assert(byCheck("events/value_not_nan") === 1L)
  }

  test("ewmaSmooth matches the hand-computed weighted mean") {
    val df = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 30.0))
      .toDF("u", "t", "e", "v")
    val out = Stats.ewmaSmooth(df, col("u"), col("t"), col("e"), col("v"),
        alpha = 0.5, window = 3)
      .collect().map(_.getDouble(4))
    // α=0.5 → weights 1, 0.5, 0.25.
    assert(out(0) === 10.0)                                // only itself
    assert(out(1) === math.rint((20.0 + 0.5 * 10.0) / 1.5 * 1e4) / 1e4)
    assert(out(2) === math.rint(
      (30.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75 * 1e4) / 1e4)
  }

  test("ewmaSmooth window bound drops observations beyond the frame") {
    val df = (1L to 5L).map(i => (1L, i, i, 100.0 * i))
      .toDF("u", "t", "e", "v")
    val out = Stats.ewmaSmooth(df, col("u"), col("t"), col("e"), col("v"),
        alpha = 0.5, window = 2)
      .collect().map(_.getDouble(4))
    // window=2: row 5 sees only rows 5 and 4.
    assert(out(4) === math.rint((500.0 + 0.5 * 400.0) / 1.5 * 1e4) / 1e4)
  }
}
