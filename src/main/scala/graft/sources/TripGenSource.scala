package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source: a deterministic trip-record generator —
  * `spark.read.format("graft.sources.TripGenSource").option("rows", n)`.
  * The reference's producer replays a CSV file through Kafka to feed its
  * consumer (kafka_producer.py:34-115); this is the file-less engine
  * equivalent for tests and benchmarks, and doubles as the engine's
  * demonstration of the full V2 read path:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): only
  *    requested fields are generated — a projection of 2 of 5 columns
  *    does 2/5 of the work, observable in the scan's `ReadSchema`.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): range/equality
  *    predicates on `id` narrow the generated interval EXACTLY (they are
  *    accepted, not re-evaluated), and partitions whose sub-range is
  *    empty are never planned — the generator's form of partition
  *    pruning.
  *
  * Rows derive from `id` by a seeded 64-bit mix, so any (rows,
  * partitions, projection, filter) combination yields bit-identical
  * values on any cluster.
  */
class TripGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // Reader options are case-insensitive everywhere else in Spark —
    // honor that here too ('rowspertrigger' must not silently fall back
    // to the default).
    val opts = new CaseInsensitiveStringMap(properties)
    new TripGenTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerTrigger", 100L))
  }
}

object TripGenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vendor_id", IntegerType, nullable = false),
    StructField("pickup_ts", TimestampType, nullable = false),
    StructField("trip_distance", DoubleType, nullable = false),
    StructField("fare_amount", DoubleType, nullable = false)))

  /** SplitMix64 — the standard 64-bit finalizer; deterministic per id. */
  def mix(id: Long): Long = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

private class TripGenTable(rows: Long, partitions: Int, rowsPerTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"tripgen($rows)"
  override def schema(): StructType = TripGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TripGenScanBuilder(rows, partitions, rowsPerTrigger)
}

private class TripGenScanBuilder(rows: Long, partitions: Int,
                                 rowsPerTrigger: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = TripGenSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    // Saturating +1: boundary literals (Long.MaxValue) must not wrap the
    // exclusive bound around to Long.MinValue and empty the scan.
    def succ(x: Long): Long = if (x == Long.MaxValue) x else x + 1
    handled.foreach {
      case EqualTo("id", v) =>
        val x = v.asInstanceOf[Number].longValue()
        lo = math.max(lo, x); hi = math.min(hi, succ(x))
      case GreaterThan("id", v) =>
        lo = math.max(lo, succ(v.asInstanceOf[Number].longValue()))
      case GreaterThanOrEqual("id", v) =>
        lo = math.max(lo, v.asInstanceOf[Number].longValue())
      case LessThan("id", v) =>
        hi = math.min(hi, v.asInstanceOf[Number].longValue())
      case LessThanOrEqual("id", v) =>
        hi = math.min(hi, succ(v.asInstanceOf[Number].longValue()))
      case _ =>
    }
    accepted = handled
    rest // accepted filters are exact — nothing to re-evaluate
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"tripgen range=[$lo,$hi) cols=${required.fieldNames.mkString(",")} " +
        s"pushed=${accepted.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] = {
      // Partition boundaries are fixed over the FULL id domain (like
      // files of a table); the pushed range intersects each slice and
      // empty intersections are never planned — partition pruning, not
      // re-splitting of the residual range.
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      (0 until partitions).iterator
        .map(p => (math.max(lo, p * per), math.min(hi, (p + 1) * per)))
        .filter { case (s, e) => s < e }
        .map { case (s, e) => TripGenPartition(s, e, required.fieldNames)
          : InputPartition }
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      TripGenReaderFactory()

    /** The same scan as a micro-batch stream (the V2 unified read path —
      * pruning and pushdown apply identically): offsets are row ids,
      * `latestOffset` advances by `rowsPerTrigger` per trigger (T7 rate
      * control) until the finite id range is exhausted; each batch plans
      * the [start, end) slice with the already-narrowed bounds.
      */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new MicroBatchStream {
        private def off(v: Long): Offset = new Offset {
          override def json(): String = v.toString
        }
        // Advances by rowsPerTrigger each time the engine asks what's
        // available — bounded micro-batches over the finite id range.
        private var available = lo
        override def initialOffset(): Offset = off(lo)
        override def deserializeOffset(json: String): Offset = synchronized {
          // A restored checkpoint offset must floor the advance — without
          // this, a restart would regress below the committed offset and
          // re-emit rows.
          val v = json.toLong
          available = math.max(available, v)
          off(v)
        }
        override def latestOffset(): Offset = synchronized {
          available = math.min(hi, math.max(available, lo) + rowsPerTrigger)
          off(available)
        }
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
          val s = start.json().toLong
          val e = end.json().toLong
          val per = math.max(1L, (e - s + partitions - 1) / partitions)
          (0 until partitions).iterator
            .map(p => (s + p * per, math.min(e, s + (p + 1) * per)))
            .filter { case (a, b) => a < b }
            .map { case (a, b) =>
              TripGenPartition(a, b, required.fieldNames): InputPartition }
            .toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          TripGenReaderFactory()
      }
  }
}

private case class TripGenPartition(start: Long, end: Long,
                                    cols: Array[String]) extends InputPartition

private case class TripGenReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TripGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val h = TripGenSource.mix(id)
        val row = new GenericInternalRow(p.cols.length)
        var i = 0
        while (i < p.cols.length) {
          p.cols(i) match {
            case "id" => row.update(i, id)
            case "vendor_id" => row.update(i, (java.lang.Long.remainderUnsigned(h, 2L) + 1L).toInt)
            case "pickup_ts" =>
              // Jan 2015, one trip every 3 s of simulated time (µs).
              row.update(i, 1420070400000000L + id * 3000000L)
            case "trip_distance" =>
              row.update(i, java.lang.Long.remainderUnsigned(h >>> 8, 3000L) / 100.0)
            case "fare_amount" =>
              row.update(i, java.lang.Long.remainderUnsigned(h >>> 24, 20000L) / 100.0)
            case _ => row.update(i, null)
          }
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
