package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 batch reader for Avro CONTAINER files —
  * `spark.read.format("graft.sources.AvroSource").load(path)` — built
  * on the avro core/mapred jars Spark already ships, because the
  * `spark-avro` external module is not on this classpath. Completes
  * the batch format matrix (parquet/ORC/CSV/JSONL/XML/JDBC/DSv2-gen)
  * with the remaining common interchange format.
  *
  * Scale design:
  *  - **Session Hadoop configuration everywhere**: listing, schema
  *    inference, readers, writers, and the commit protocol all run
  *    under `spark.sessionState.newHadoopConf()` on the driver and a
  *    [[SerializableConfiguration]] shipped inside the reader/writer
  *    factories on executors — so `spark.hadoop.*` settings
  *    (filesystem credentials, endpoints, custom `fs.*.impl`
  *    bindings) reach every FS touch, exactly like the built-in file
  *    sources. A bare `new Configuration()` is used only when no
  *    session exists (never in a real job).
  *  - **Sync-marker file splitting**: each container file is split
  *    into byte ranges of `splitBytes` (option; default 128 MB — the
  *    `files.maxPartitionBytes` spirit) and every partition
  *    `sync(start)`s to the first block boundary at-or-after its
  *    range and reads blocks until `pastSync(end)` — the classic
  *    avro-mapred split contract, so each block is consumed by
  *    exactly one partition and a single 10 GB file still fans out
  *    across the cluster.
  *  - **Column pruning at DECODE level**
  *    (`SupportsPushDownRequiredColumns`): the pruned columns become a
  *    projected Avro READER schema, so Avro's schema resolution SKIPS
  *    the unneeded fields during decode — not a post-hoc projection
  *    (the same property the parquet `ReadSchema` pin checks).
  *  - **Hive-layout partition discovery + listing-layer pruning**:
  *    `key=value` directories recurse (any depth), their keys become
  *    typed partition columns appended after the data columns (int →
  *    long → double → string inference, `__HIVE_DEFAULT_PARTITION__`
  *    → null), and `EqualTo`/`In`/range
  *    (`GreaterThan[OrEqual]`/`LessThan[OrEqual]`)/null-test filters
  *    on partition columns are accepted in `SupportsPushDownFilters`
  *    and applied to the FILE
  *    LIST — a pruned directory's files are never opened, listed
  *    lengths are reused for split planning (no second FS pass).
  *    Unexpected non-partition subdirectories fail loudly rather than
  *    silently skipping data.
  *  - **Versioned atomic overwrite**: overwrite stages committed task
  *    files into `_commit_<queryId>` and publishes them with ONE
  *    directory rename to `data_v<N+1>`; readers resolve the highest
  *    `data_v*` directory (ignoring flat files once versions exist),
  *    so a crash anywhere in the protocol leaves either the old or
  *    the new table state fully readable — never a mix, never
  *    neither. Old versions and legacy flat files become garbage at
  *    the rename and are swept afterwards (self-healing: the next
  *    overwrite also sweeps a crashed predecessor's leftovers).
  *    Concurrent reads racing the post-publish SWEEP of the previous
  *    version can still lose files mid-scan — same caveat as every
  *    non-snapshotting file table.
  *  - Table schema comes from the FIRST file's writer schema (sorted
  *    order); other files resolve against it with Avro's native
  *    per-file schema resolution, so a drifted file that LACKS a
  *    column with a default (our writer gives every nullable column a
  *    null default) reads as nulls, and extra fields are skipped at
  *    decode. A drifted file that cannot resolve (missing a
  *    no-default column, incompatible type) fails loudly in Avro
  *    resolution rather than silently retyping — the [[Tables.csv]]
  *    rule.
  *
  * Type mapping: boolean/int/long/float/double/string/enum/bytes/fixed
  * → the obvious Catalyst types; `[null, T]` unions → nullable T;
  * arrays, string-keyed maps and nested records recurse;
  * timestamp-micros/millis → TimestampType (millis rescaled ×1000 to
  * Catalyst micros at ANY nesting depth — `convert` carries the Avro
  * schema), date → DateType. Anything else (multi-branch unions,
  * recursive records) is rejected at planning time with the offending
  * field named.
  */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.tableSchema(options.get("path"), AvroSource.driverConf())

  // Writes hand the dataframe's schema straight to getTable — a write
  // to a not-yet-existing path has no files to infer from.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "AvroSource requires a path")
    new AvroTable(path, opts.getLong("splitBytes", 128L * 1024 * 1024),
      Option(schema))
  }
}

object AvroSource {
  /** Session Hadoop conf on the driver — carries every `spark.hadoop.*`
    * setting (fs credentials, endpoints, `fs.*.impl` bindings). The
    * bare-Configuration fallback only fires with no active session
    * (never inside a planned query).
    */
  private[sources] def driverConf(): Configuration =
    SparkSession.getActiveSession
      // getActiveSession is THREAD-local — Spark invokes parts of the
      // write path (createBatchWriterFactory) from scheduler threads
      // where it is unset; the default session is the process-global
      // fallback
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** One data file as discovered by [[listLayout]]: absolute path, its
    * listed length (reused for split planning — no second FS pass),
    * and the raw `key=value` partition values on its directory path.
    */
  private[sources] case class AvroFile(path: String, len: Long,
                                       partValues: Seq[String])

  private val VersionDir = "^data_v([0-9]+)$".r
  private val PartDir = "^([^=/]+)=(.*)$".r
  private[sources] val HiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Highest `data_v<N>` version under `root`, if any — the versioned
    * overwrite protocol's current-state pointer.
    */
  private[sources] def currentVersion(root: Path, fs: FileSystem): Option[Long] = {
    val vs =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.collect {
        case st if st.isDirectory => st.getPath.getName match {
          case VersionDir(n) => Some(n.toLong)
          case _ => None
        }
      }.flatten
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Recursive listing under the Hive `key=value` layout, with the
    * versioned-overwrite indirection at the root: if any `data_v<N>`
    * directories exist, the highest N IS the table and everything
    * else at the root (flat files, lower versions) is a past state.
    * Returns the files (sorted by path — the first is the schema
    * source) and the partition key names in directory order.
    */
  private[sources] def listLayout(path: String, conf: Configuration)
      : (Seq[AvroFile], Seq[String]) = {
    require(path != null, "AvroSource requires a path")
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val st = fs.getFileStatus(root)
    if (st.isFile)
      return (Seq(AvroFile(root.toString, st.getLen, Nil)), Nil)
    val effRoot = currentVersion(root, fs)
      .map(v => new Path(root, s"data_v$v")).getOrElse(root)
    val out = scala.collection.mutable.ArrayBuffer.empty[AvroFile]
    var keys: Option[Seq[String]] = None
    def walk(dir: Path, vals: Seq[(String, String)]): Unit =
      fs.listStatus(dir).foreach { c =>
        val n = c.getPath.getName
        if (c.isFile) {
          if (n.endsWith(".avro") && !n.startsWith("_") && !n.startsWith(".")) {
            val ks = vals.map(_._1)
            keys match {
              case None => keys = Some(ks)
              case Some(k0) => require(k0 == ks,
                s"inconsistent partition layout under $path: " +
                  s"${c.getPath} has partition keys $ks, expected $k0")
            }
            out += AvroFile(c.getPath.toString, c.getLen, vals.map(_._2))
          }
        } else if (n.startsWith("_") || n.startsWith(".")) ()
        else n match {
          case PartDir(k, v) => walk(c.getPath, vals :+ (k -> v))
          case other => throw new IllegalArgumentException(
            s"unexpected subdirectory '$other' under Avro table path $path" +
              " — only key=value partition directories are supported")
        }
      }
    walk(effRoot, Nil)
    require(out.nonEmpty, s"no .avro files under $path")
    (out.sortBy(_.path).toSeq, keys.getOrElse(Nil))
  }

  /** Partition-column types inferred from the observed values, the
    * parquet source's spirit at reduced surface: all-int → IntegerType,
    * all-long → LongType, all-double → DoubleType, else StringType;
    * `__HIVE_DEFAULT_PARTITION__` reads as null (and is ignored for
    * inference). Columns are nullable like every file-source column.
    */
  private[sources] def partitionSchema(keys: Seq[String],
                                       files: Seq[AvroFile]): StructType =
    StructType(keys.zipWithIndex.map { case (k, i) =>
      val vals = files.map(_.partValues(i)).filter(_ != HiveNullPartition)
      val dt =
        if (vals.forall(v => scala.util.Try(v.toInt).isSuccess)) IntegerType
        else if (vals.forall(v => scala.util.Try(v.toLong).isSuccess)) LongType
        else if (vals.forall(v => scala.util.Try(v.toDouble).isSuccess)) DoubleType
        else StringType
      StructField(k, dt, nullable = true)
    })

  /** Raw directory value → external (filter-comparable) value of `dt`. */
  private[sources] def partValueExternal(raw: String, dt: DataType): Any =
    if (raw == HiveNullPartition) null
    else dt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case DoubleType => raw.toDouble
      case _ => raw
    }

  /** Raw directory value → Catalyst internal value of `dt`. */
  private[sources] def partValueInternal(raw: String, dt: DataType): Any =
    if (raw == HiveNullPartition) null
    else dt match {
      case StringType => UTF8String.fromString(raw)
      case other => partValueExternal(raw, other)
    }

  /** SQL comparison of a partition value against a pushed filter value.
    * Both sides carry the inferred partition type (Spark casts the
    * literal to the column type before translation), so numeric pairs
    * compare through BigDecimal — exact for int/long/double alike — and
    * strings lexicographically, matching the post-scan semantics the
    * claimed pushdown replaces. A shape this method can't order is a
    * bug in [[AvroScanBuilder.pushFilters]]'s accept list: fail loudly.
    */
  private def partCompare(pv: Any, v: Any): Int = (pv, v) match {
    case (a: Number, b: Number) =>
      new java.math.BigDecimal(a.toString)
        .compareTo(new java.math.BigDecimal(b.toString))
    case (a: String, b: String) => a.compareTo(b)
    case _ => throw new IllegalStateException(
      s"unorderable pushed partition comparison: $pv vs $v " +
        s"(${pv.getClass.getName} vs ${v.getClass.getName})")
  }

  /** Does `f` survive the pushed partition filters? Only the filter
    * shapes [[AvroScanBuilder.pushFilters]] accepts appear here. A null
    * partition value (`__HIVE_DEFAULT_PARTITION__`) fails every
    * comparison — SQL's null-predicate-filters-out semantics — and
    * matches only `IsNull`.
    */
  private[sources] def partitionMatch(f: AvroFile, keys: Seq[String],
      partSchema: StructType, filters: Seq[Filter]): Boolean = {
    def valueOf(col: String): Any = {
      val i = keys.indexOf(col)
      partValueExternal(f.partValues(i), partSchema(col).dataType)
    }
    def cmp(a: String, v: Any)(ok: Int => Boolean): Boolean = {
      val pv = valueOf(a); pv != null && ok(partCompare(pv, v))
    }
    filters.forall {
      case EqualTo(a, v) => val pv = valueOf(a); pv != null && pv == v
      case In(a, vs) => val pv = valueOf(a); pv != null && vs.contains(pv)
      case GreaterThan(a, v) => cmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case LessThan(a, v) => cmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v)(_ <= 0)
      case IsNull(a) => valueOf(a) == null
      case IsNotNull(a) => valueOf(a) != null
      case _ => true
    }
  }

  /** Full table schema: data columns from the first file's writer
    * schema, then the discovered partition columns.
    */
  private[sources] def tableSchema(path: String,
                                   conf: Configuration): StructType = {
    val (files, keys) = listLayout(path, conf)
    StructType(sqlSchemaOf(writerSchema(files.map(_.path), conf)) ++
      partitionSchema(keys, files))
  }

  private[sources] def writerSchema(files: Seq[String],
                                    conf: Configuration): Schema = {
    val in = new FsInput(new Path(files.head), conf)
    val r = DataFileReader.openReader(in,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** `[null, T]` union → (T, nullable); plain schema → (s, false). */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size <= 2,
        s"unsupported Avro union $s — only [null, T] is mapped")
      (nonNull.head, branches.size == 2)
    } else (s, false)

  private def sqlTypeOf(raw: Schema): DataType = {
    val (s, _) = unwrap(raw)
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _ => IntegerType
      }
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          TimestampType
        case _ => LongType
      }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.ARRAY =>
        ArrayType(sqlTypeOf(s.getElementType),
          containsNull = unwrap(s.getElementType)._2)
      case Schema.Type.MAP =>
        MapType(StringType, sqlTypeOf(s.getValueType),
          valueContainsNull = unwrap(s.getValueType)._2)
      case Schema.Type.RECORD => sqlSchemaOf(s)
      case t => throw new IllegalArgumentException(
        s"unsupported Avro type $t in $s")
    }
  }

  private[sources] def sqlSchemaOf(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${record.getType}")
    StructType(record.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), sqlTypeOf(f.schema()), unwrap(f.schema())._2)
    })
  }

  /** Catalyst → Avro schema, the reverse of [[sqlSchemaOf]]: nullable
    * fields become `[null, T]` unions with a null DEFAULT (which is
    * what makes schema-drift resolution work for files written by this
    * sink — a reader whose schema has the column fills the default
    * when a file lacks it), TimestampType/DateType carry the
    * timestamp-micros/date logical types (so a roundtrip through
    * [[sqlSchemaOf]] is the identity), and nested records are named by
    * field path for uniqueness.
    */
  private[sources] def avroSchemaOf(st: StructType,
                                    name: String = "spark_record"): Schema = {
    def of(dt: DataType, nullable: Boolean, path: String): Schema = {
      val base = dt match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType => LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
        case DateType => LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
        case ArrayType(et, cn) =>
          Schema.createArray(of(et, cn, path + "_item"))
        case MapType(StringType, vt, vn) =>
          Schema.createMap(of(vt, vn, path + "_value"))
        case s: StructType => record(s, path)
        case other => throw new IllegalArgumentException(
          s"unsupported Catalyst type $other for Avro write at $path")
      }
      if (nullable)
        Schema.createUnion(util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
    }
    def record(s: StructType, path: String): Schema = {
      val fields = s.fields.map { f =>
        new Schema.Field(f.name, of(f.dataType, f.nullable,
            path + "_" + f.name), null,
          if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(path, null, "graft.avro", false,
        util.Arrays.asList(fields: _*))
    }
    record(st, name)
  }

  /** Catalyst internal value → Avro runtime value under `avro`
    * (nullable values target the union's non-null branch).
    */
  private[sources] def toAvro(v: Any, dt: DataType, avro: Schema): AnyRef = {
    if (v == null) return null
    val target =
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else avro
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           TimestampType | DateType => v.asInstanceOf[AnyRef]
      case StringType => v.toString
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(et, _) =>
        val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val out = new util.ArrayList[AnyRef](ad.numElements())
        var i = 0
        while (i < ad.numElements()) {
          out.add(toAvro(ad.get(i, et), et, target.getElementType)); i += 1
        }
        out
      case MapType(_, vt, _) =>
        val md = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new util.HashMap[String, AnyRef]()
        val (ks, vs) = (md.keyArray(), md.valueArray())
        var i = 0
        while (i < md.numElements()) {
          out.put(ks.getUTF8String(i).toString,
            toAvro(vs.get(i, vt), vt, target.getValueType))
          i += 1
        }
        out
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new org.apache.avro.generic.GenericData.Record(target)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvro(row.get(i, st(i).dataType), st(i).dataType,
            target.getFields.get(i).schema()))
          i += 1
        }
        rec
    }
  }

  /** Projected READER schema: the writer record restricted to the
    * pruned column set, writer order preserved (Avro resolution skips
    * the rest during decode). Field DEFAULTS are preserved — they are
    * what lets a drifted file that lacks a defaulted column resolve to
    * the default instead of failing.
    */
  private[sources] def project(writer: Schema, cols: Seq[String]): Schema = {
    val keep = cols.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name())).map {
      f => new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc,
      writer.getNamespace, false, fields.toList.asJava)
  }

  /** Avro runtime value → Catalyst internal value for `dt`, under the
    * field's Avro schema `avro` — carried so logical-type rescales
    * apply at ANY nesting depth (a timestamp-millis inside a struct,
    * array, or map gets the same ×1000 to Catalyst micros as a
    * top-level one; the r11 reader rescaled only top-level columns).
    */
  private[sources] def convert(v: Any, dt: DataType, avro: Schema): Any =
    if (v == null) null
    else {
      val s =
        if (avro.getType == Schema.Type.UNION)
          avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        else avro
      dt match {
        case BooleanType | IntegerType | LongType | FloatType | DoubleType => v
        case TimestampType =>
          if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
            v.asInstanceOf[Long] * 1000L
          else v.asInstanceOf[Long]
        case DateType => v.asInstanceOf[Int]
        case StringType => UTF8String.fromString(v.toString)
        case BinaryType => v match {
          case b: java.nio.ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
          case a: Array[Byte] => a
        }
        case ArrayType(et, _) =>
          new GenericArrayData(v.asInstanceOf[java.util.Collection[Any]]
            .asScala.map(convert(_, et, s.getElementType)).toArray)
        case MapType(_, vt, _) =>
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
          ArrayBasedMapData(
            m.map(kv => UTF8String.fromString(kv._1.toString)).toArray,
            m.map(kv => convert(kv._2, vt, s.getValueType)).toArray)
        case st: StructType =>
          val rec = v.asInstanceOf[GenericRecord]
          val row = new GenericInternalRow(st.length)
          var i = 0
          while (i < st.length) {
            row.update(i, convert(rec.get(st(i).name), st(i).dataType,
              s.getField(st(i).name).schema()))
            i += 1
          }
          row
      }
    }
}

private class AvroTable(path: String, splitBytes: Long,
                        provided: Option[StructType])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"avro($path)"
  override def schema(): StructType = provided.getOrElse(
    AvroSource.tableSchema(path, AvroSource.driverConf()))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = AvroSource.driverConf()
    // Reads always decode under the files' writer schema (plus the
    // discovered partition columns). A user-specified `.schema(...)`
    // that differs would be silently ignored — fail loudly instead
    // (the explicit-schema sources get their fail-on-drift contract
    // from Spark; this one derives it from the container header).
    provided.foreach { s =>
      val derived = AvroSource.tableSchema(path, conf)
      require(s == derived,
        s"AvroSource reads with the files' writer schema " +
          s"${derived.catalogString}; a different user schema " +
          s"${s.catalogString} cannot override it — drop .schema(...)")
    }
    new AvroScanBuilder(path, splitBytes, conf)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new AvroWriteBuilder(path, info.schema(), info.queryId())
}

private class AvroScanBuilder(path: String, splitBytes: Long,
                              conf: Configuration)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private val (files, partKeys) = AvroSource.listLayout(path, conf)
  private val writer = AvroSource.writerSchema(files.map(_.path), conf)
  private val partSchema = AvroSource.partitionSchema(partKeys, files)
  private val full = StructType(AvroSource.sqlSchemaOf(writer) ++ partSchema)
  private var required: StructType = full
  private var pushedPart: Array[Filter] = Array.empty

  // Partition pruning at the LISTING layer: equality, IN, range, and
  // null-test filters on partition columns are fully answered by the
  // directory values, so they are claimed as pushed (Spark drops them
  // post-scan) and the matching directories' files are the only ones
  // planned or opened — a `day >= X` retention scan over a date-
  // partitioned lake prunes exactly like an equality probe. Everything
  // else stays with Spark.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val partCols = partSchema.fieldNames.toSet
    val (acc, rest) = filters.partition {
      case EqualTo(a, _) => partCols(a)
      case In(a, _) => partCols(a)
      case GreaterThan(a, _) => partCols(a)
      case GreaterThanOrEqual(a, _) => partCols(a)
      case LessThan(a, _) => partCols(a)
      case LessThanOrEqual(a, _) => partCols(a)
      case IsNull(a) => partCols(a)
      case IsNotNull(a) => partCols(a)
      case _ => false
    }
    pushedPart = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushedPart

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve table field order so decode and output line up
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep(f.name)))
  }

  override def build(): Scan = {
    val kept = files.filter(f =>
      AvroSource.partitionMatch(f, partKeys, partSchema,
        pushedPart.toIndexedSeq))
    new AvroScan(kept, writer, required, partKeys, partSchema, splitBytes,
      new SerializableConfiguration(conf))
  }
}

private class AvroScan(files: Seq[AvroSource.AvroFile], writer: Schema,
                       required: StructType, partKeys: Seq[String],
                       partSchema: StructType, splitBytes: Long,
                       serConf: SerializableConfiguration)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroScan ReadSchema: ${required.catalogString}" +
      (if (partKeys.nonEmpty) s" PartitionKeys: ${partKeys.mkString(",")}" +
        s" PartitionedFiles: ${files.length}" else "")
  override def planInputPartitions(): Array[InputPartition] =
    // lengths come from the listing — no per-file FS round trip here
    files.flatMap { f =>
      val step = math.max(1L, splitBytes)
      (0L until math.max(1L, (f.len + step - 1) / step)).map { i =>
        AvroFilePartition(f.path, i * step, math.min(f.len, (i + 1) * step),
          f.partValues)
      }
    }.map(identity[InputPartition]).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val partSet = partKeys.toSet
    val dataCols = required.fieldNames.filterNot(partSet).toSeq
    new AvroReaderFactory(
      AvroSource.project(writer, dataCols).toString,
      required, partKeys, partSchema, serConf)
  }
}

/** A byte range of one container file; the reader `sync`s to the first
  * block boundary at-or-after `start` and stops once `pastSync(end)` —
  * each Avro block is consumed by exactly one partition. Raw partition
  * values ride along and become per-row constants.
  */
private case class AvroFilePartition(file: String, start: Long, end: Long,
                                     partValues: Seq[String])
    extends InputPartition

/** Schema rides as its JSON string — `org.apache.avro.Schema` is not
  * serializable. The session Hadoop conf rides as a
  * [[SerializableConfiguration]] so executor-side file opens see the
  * same fs bindings/credentials the driver planned with.
  */
private class AvroReaderFactory(readerSchemaJson: String,
                                required: StructType,
                                partKeys: Seq[String],
                                partSchema: StructType,
                                serConf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AvroFilePartition]
    val readerSchema = new Schema.Parser().parse(readerSchemaJson)
    val datumReader = new GenericDatumReader[GenericRecord](null, readerSchema)
    val in = new FsInput(new Path(part.file), serConf.value)
    val reader = DataFileReader.openReader(in, datumReader)
    // avro-mapred split contract: own the blocks whose sync point
    // falls in [start, end).
    reader.sync(part.start)
    val partIdx = partKeys.zipWithIndex.toMap
    // Per required output column: Right(constant) for a partition
    // column, Left(avro field schema) for a data column. Constants are
    // computed once per partition, not per row.
    val columns: Array[Either[Schema, Any]] = required.fields.map { f =>
      partIdx.get(f.name) match {
        case Some(i) => Right(AvroSource.partValueInternal(
          part.partValues(i), partSchema(f.name).dataType))
        case None => Left(readerSchema.getField(f.name).schema())
      }
    }
    new PartitionReader[InternalRow] {
      override def next(): Boolean =
        reader.hasNext && !reader.pastSync(part.end)
      override def get(): InternalRow = {
        val rec = reader.next()
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, columns(i) match {
            case Right(const) => const
            case Left(fieldSchema) => AvroSource.convert(
              rec.get(required(i).name), required(i).dataType, fieldSchema)
          })
          i += 1
        }
        row
      }
      override def close(): Unit = reader.close()
    }
  }
}

// ---------------------------------------------------------------------
// Write path — `df.write.format("graft.sources.AvroSource")
//   .mode("append"|"overwrite").save(path)`.
//
// Commit protocol (the warehouse's staged-move discipline, hardened to
// a versioned atomic publish for overwrite): every task writes
// `part-<partition>-<task>-<query>.avro` into `path/_write_<queryId>`
// (an underscore dir the read side's listing ignores) and task commit
// reports the file. Job commit:
//   append    → rename the COMMITTED files into the current table
//               directory (the highest `data_v<N>` if versions exist,
//               else the flat root).
//   overwrite → rename the COMMITTED files into `_commit_<queryId>`,
//               then ONE directory rename publishes it as
//               `data_v<N+1>` — the single atomic visibility point.
//               Readers resolve the highest data_v*, so a crash before
//               the rename leaves the old state readable and a crash
//               after it leaves the new state readable; there is no
//               window where neither (or a mix) is visible. Old
//               versions and legacy flat files are swept AFTER the
//               publish (and by any later overwrite — self-healing).
// Staging is dropped LAST; task retries write distinct task-id names,
// and only files named in COMMITTED task messages are moved, so a
// zombie task's output dies with the staging dir. Every rename's
// boolean result is require()d — a false return is a lost-data bug,
// not a soft failure.
// ---------------------------------------------------------------------

private class AvroWriteBuilder(path: String, schema: StructType,
                               queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch
          : org.apache.spark.sql.connector.write.BatchWrite =
        new AvroBatchWrite(path, schema, queryId, doTruncate)
    }
}

private case class AvroCommitMessage(files: Seq[String])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private class AvroBatchWrite(path: String, schema: StructType,
                             queryId: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private def stagingPath = new Path(path, s"_write_$queryId")
  private def commitStagePath = new Path(path, s"_commit_$queryId")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new AvroDataWriterFactory(stagingPath.toString,
      AvroSource.avroSchemaOf(schema).toString, schema, queryId,
      new SerializableConfiguration(AvroSource.driverConf()))

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(AvroSource.driverConf())
    if (!fs.exists(root)) { fs.mkdirs(root); () }
    val committed = messages.toSeq.flatMap {
      case AvroCommitMessage(files) => files
      case _ => Seq.empty
    }
    def move(src: Path, destDir: Path): Unit = {
      val dest = new Path(destDir, src.getName)
      require(fs.rename(src, dest), s"rename failed: $src -> $dest")
    }
    if (truncate) {
      val next = AvroSource.currentVersion(root, fs).getOrElse(0L) + 1
      fs.mkdirs(commitStagePath)
      committed.foreach(f => move(new Path(f), commitStagePath))
      // A zero-PARTITION frame (spark.emptyDataFrame-derived) runs no
      // write tasks at all, so `committed` is empty and the published
      // version would hold no container files — after which every read
      // fails "no .avro files". A truncate must stay readable-empty:
      // stage one schema-carrying header-only file so the new version
      // reads as an empty table with the written schema (a FILTERED
      // empty frame already gets this for free from its header-writing
      // tasks).
      if (committed.isEmpty) {
        val avroSchema = AvroSource.avroSchemaOf(schema)
        val empty = new Path(commitStagePath,
          s"part-empty-${queryId.take(8)}.avro")
        val w = new DataFileWriter[GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](
            avroSchema))
        w.create(avroSchema, fs.create(empty, true))
        w.close()
      }
      val dest = new Path(root, s"data_v$next")
      // the atomic publish: one directory rename flips readers from
      // data_v<next-1> (or the flat root) to data_v<next>
      require(fs.rename(commitStagePath, dest),
        s"rename failed: $commitStagePath -> $dest")
      // sweep superseded state (old versions, legacy flat files, and
      // crashed predecessors' _write_/_commit_ staging debris) —
      // readers already ignore all of it once data_v<next> exists.
      // Concurrent writers to ONE path are not supported (their
      // staging would be swept here too); that is the same contract as
      // every non-locking file table.
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val debris =
          (n.matches("data_v[0-9]+") && n != dest.getName) ||
            ((n.startsWith("_write_") || n.startsWith("_commit_")) &&
              !n.endsWith(queryId))
        if (st.isDirectory && debris) { fs.delete(st.getPath, true); () }
        else if (st.isFile && n.endsWith(".avro"))
          { fs.delete(st.getPath, false); () }
      }
    } else {
      val dest = AvroSource.currentVersion(root, fs)
        .map(v => new Path(root, s"data_v$v")).getOrElse(root)
      committed.foreach(f => move(new Path(f), dest))
    }
    fs.delete(stagingPath, true)
    ()
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val fs = stagingPath.getFileSystem(AvroSource.driverConf())
    fs.delete(stagingPath, true)
    fs.delete(commitStagePath, true)
    ()
  }
}

private class AvroDataWriterFactory(staging: String, avroSchemaJson: String,
                                    sqlSchema: StructType, queryId: String,
                                    serConf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val avroSchema = new Schema.Parser().parse(avroSchemaJson)
    // queryId suffix keeps append-mode names collision-free across
    // sessions (task ids restart per SparkContext); rename's require()
    // in commit would catch a clash, but not needing to is better.
    val file = new Path(staging,
      f"part-$partitionId%05d-$taskId-${queryId.take(8)}.avro")
    val fs = file.getFileSystem(serConf.value)
    val out = fs.create(file, true)
    val writer = new DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](
        avroSchema))
    writer.create(avroSchema, out)
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        var i = 0
        while (i < sqlSchema.length) {
          rec.put(i, AvroSource.toAvro(row.get(i, sqlSchema(i).dataType),
            sqlSchema(i).dataType, avroSchema.getFields.get(i).schema()))
          i += 1
        }
        writer.append(rec)
        ()
      }
      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        writer.close()
        AvroCommitMessage(Seq(file.toString))
      }
      override def abort(): Unit = {
        try writer.close() catch { case _: Throwable => () }
        if (fs.exists(file)) { fs.delete(file, false); () }
        ()
      }
      override def close(): Unit = ()
    }
  }
}
