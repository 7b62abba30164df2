package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch reader for Avro CONTAINER files —
  * `spark.read.format("graft.sources.AvroSource").load(path)` — built
  * on the avro core/mapred jars Spark already ships, because the
  * `spark-avro` external module is not on this classpath. Completes
  * the batch format matrix (parquet/ORC/CSV/JSONL/XML/JDBC/DSv2-gen)
  * with the remaining common interchange format.
  *
  * Scale design:
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
  *  - Schema comes from the FIRST file's writer schema (homogeneous
  *    directory contract; a drifted file fails loudly in Avro schema
  *    resolution rather than silently retyping — the [[Tables.csv]]
  *    rule).
  *
  * Type mapping: boolean/int/long/float/double/string/enum/bytes/fixed
  * → the obvious Catalyst types; `[null, T]` unions → nullable T;
  * arrays, string-keyed maps and nested records recurse;
  * timestamp-micros/millis → TimestampType, date → DateType. Anything
  * else (multi-branch unions, recursive records) is rejected at
  * planning time with the offending field named.
  */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.sqlSchemaOf(
      AvroSource.writerSchema(AvroSource.listFiles(options.get("path"))))

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
  private[sources] def listFiles(path: String): Seq[String] = {
    require(path != null, "AvroSource requires a path")
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
          .filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("_")
            && !f.getName.startsWith("."))
      else Seq(p)
    require(files.nonEmpty, s"no .avro files under $path")
    files.map(_.toString).sorted
  }

  private[sources] def writerSchema(files: Seq[String]): Schema = {
    val in = new FsInput(new Path(files.head), new Configuration())
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
    * fields become `[null, T]` unions, TimestampType/DateType carry
    * the timestamp-micros/date logical types (so a roundtrip through
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
    * the rest during decode).
    */
  private[sources] def project(writer: Schema, cols: Seq[String]): Schema = {
    val keep = cols.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name())).map {
      f => new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc,
      writer.getNamespace, false, fields.toList.asJava)
  }

  /** Avro runtime value → Catalyst internal value for `dt`. */
  private[sources] def convert(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType => v
      // micros pass through; millis are rescaled by the reader, which
      // knows the logical type
      case TimestampType => v.asInstanceOf[Long]
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
          .asScala.map(convert(_, et)).toArray)
      case MapType(_, vt, _) =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
        ArrayBasedMapData(
          m.map(kv => UTF8String.fromString(kv._1.toString)).toArray,
          m.map(kv => convert(kv._2, vt)).toArray)
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        val row = new GenericInternalRow(st.length)
        var i = 0
        while (i < st.length) {
          row.update(i, convert(rec.get(st(i).name), st(i).dataType))
          i += 1
        }
        row
    }
}

private class AvroTable(path: String, splitBytes: Long,
                        provided: Option[StructType])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"avro($path)"
  override def schema(): StructType = provided.getOrElse(
    AvroSource.sqlSchemaOf(
      AvroSource.writerSchema(AvroSource.listFiles(path))))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Reads always decode under the files' writer schema. A
    // user-specified `.schema(...)` that differs would be silently
    // ignored — fail loudly instead (the explicit-schema sources get
    // their fail-on-drift contract from Spark; this one derives it
    // from the container header).
    provided.foreach { s =>
      val derived = AvroSource.sqlSchemaOf(
        AvroSource.writerSchema(AvroSource.listFiles(path)))
      require(s == derived,
        s"AvroSource reads with the files' writer schema " +
          s"${derived.catalogString}; a different user schema " +
          s"${s.catalogString} cannot override it — drop .schema(...)")
    }
    new AvroScanBuilder(path, splitBytes)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new AvroWriteBuilder(path, info.schema(), info.queryId())
}

private class AvroScanBuilder(path: String, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val files = AvroSource.listFiles(path)
  private val writer = AvroSource.writerSchema(files)
  private var required: StructType = AvroSource.sqlSchemaOf(writer)

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve writer field order so decode and output line up
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(
      AvroSource.sqlSchemaOf(writer).fields.filter(f => keep(f.name)))
  }

  override def build(): Scan =
    new AvroScan(files, writer, required, splitBytes)
}

private class AvroScan(files: Seq[String], writer: Schema,
                       required: StructType, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroScan ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    files.flatMap { f =>
      val p = new Path(f)
      val len = p.getFileSystem(conf).getFileStatus(p).getLen
      val step = math.max(1L, splitBytes)
      (0L until math.max(1L, (len + step - 1) / step)).map { i =>
        AvroFilePartition(f, i * step, math.min(len, (i + 1) * step))
      }
    }.map(identity[InputPartition]).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(
      AvroSource.project(writer, required.fieldNames.toSeq).toString,
      required)
}

/** A byte range of one container file; the reader `sync`s to the first
  * block boundary at-or-after `start` and stops once `pastSync(end)` —
  * each Avro block is consumed by exactly one partition.
  */
private case class AvroFilePartition(file: String, start: Long, end: Long)
    extends InputPartition

/** Schema rides as its JSON string — `org.apache.avro.Schema` is not
  * serializable.
  */
private class AvroReaderFactory(readerSchemaJson: String,
                                required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AvroFilePartition]
    val readerSchema = new Schema.Parser().parse(readerSchemaJson)
    val datumReader = new GenericDatumReader[GenericRecord](null, readerSchema)
    val in = new FsInput(new Path(part.file), new Configuration())
    val reader = DataFileReader.openReader(in, datumReader)
    // avro-mapred split contract: own the blocks whose sync point
    // falls in [start, end).
    reader.sync(part.start)
    // timestamp-millis fields need a ×1000 rescale to Catalyst micros;
    // precompute which required columns carry that logical type.
    val millisCols = required.fieldNames.map { n =>
      val f = readerSchema.getField(n).schema()
      val s = if (f.getType == Schema.Type.UNION)
        f.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else f
      s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis]
    }
    new PartitionReader[InternalRow] {
      override def next(): Boolean =
        reader.hasNext && !reader.pastSync(part.end)
      override def get(): InternalRow = {
        val rec = reader.next()
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          var v = AvroSource.convert(rec.get(required(i).name),
            required(i).dataType)
          if (millisCols(i) && v != null)
            v = v.asInstanceOf[Long] * 1000L
          row.update(i, v)
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
// Commit protocol (the warehouse's staged-move discipline): every task
// writes `part-<partition>-<task>.avro` into `path/_write_<queryId>`
// (an underscore dir the read side's listing ignores), task commit
// reports the file, job commit moves the staged files into place — on
// overwrite after deleting the existing `*.avro` data files — and
// drops staging LAST. A crash anywhere before job commit leaves the
// live data untouched; task retries write distinct task-id names, and
// only files named in COMMITTED task messages are moved, so a zombie
// task's output dies with the staging dir.
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

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new AvroDataWriterFactory(stagingPath.toString,
      AvroSource.avroSchemaOf(schema).toString, schema)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) fs.mkdirs(root)
    if (truncate)
      Option(fs.listStatus(root)).toSeq.flatten
        .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
        .foreach(st => fs.delete(st.getPath, false))
    messages.foreach {
      case AvroCommitMessage(files) => files.foreach { f =>
        val src = new Path(f)
        fs.rename(src, new Path(root, src.getName)); ()
      }
      case _ => ()
    }
    fs.delete(stagingPath, true)
    ()
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val fs = stagingPath.getFileSystem(new Configuration())
    fs.delete(stagingPath, true)
    ()
  }
}

private class AvroDataWriterFactory(staging: String, avroSchemaJson: String,
                                    sqlSchema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val avroSchema = new Schema.Parser().parse(avroSchemaJson)
    val file = new Path(staging, f"part-$partitionId%05d-$taskId.avro")
    val fs = file.getFileSystem(new Configuration())
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
        if (fs.exists(file)) fs.delete(file, false)
        ()
      }
      override def close(): Unit = ()
    }
  }
}
