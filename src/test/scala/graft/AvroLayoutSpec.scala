package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** A filesystem scheme that EXISTS ONLY in the session Hadoop conf
  * (`spark.hadoop.fs.marker.impl`) — a bare `new Configuration()`
  * cannot resolve it, so any AvroSource code path that builds its own
  * Configuration instead of threading the session's fails with
  * "No FileSystem for scheme marker". With the instance cache disabled
  * for the scheme, EVERY filesystem touch (listing, schema inference,
  * executor-side reads, writer creation, commit renames, sweeps) must
  * independently resolve through a threaded conf.
  */
class MarkerFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("marker:///")
}

/** Deployment-hardening pins for [[graft.sources.AvroSource]] beyond the
  * SourcesSpec roundtrips: session-conf threading across driver and
  * executors, Hive `key=value` partition discovery with listing-layer
  * pruning, the versioned atomic-overwrite protocol's crash states,
  * per-file schema-drift resolution, and logical-type rescale at any
  * nesting depth (the r11 verdict/ADVICE items 1–3, 7 and the
  * nested-millis ADVICE).
  */
class AvroLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writeAvroFile(dir: String, name: String,
                            df: org.apache.spark.sql.DataFrame): Unit = {
    // produce one container file with our own writer, then place it
    // under the target name (repartition(1) → exactly one part file)
    val stage = tmp("avro-stage")
    Tables.avroWrite(df.repartition(1), stage)
    val produced = new java.io.File(s"$stage/data_v1").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(produced.length == 1)
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.move(produced.head.toPath,
      java.nio.file.Paths.get(dir, name))
    ()
  }

  test("session Hadoop conf reaches listing, read, write, and commit (marker fs end-to-end)") {
    // sessionState.newHadoopConf() copies RUNTIME sql-conf entries
    // verbatim — fs credentials/bindings are set unprefixed at runtime
    // (the spark.hadoop. prefix is stripped only from STATIC SparkConf
    // entries at context creation)
    spark.conf.set("fs.marker.impl", classOf[MarkerFileSystem].getName)
    // no instance cache: every FS access must re-resolve the impl from
    // the conf it was handed — one unthreaded `new Configuration()`
    // anywhere in the path throws "No FileSystem for scheme"
    spark.conf.set("fs.marker.impl.disable.cache", "true")
    try {
      val dir = "marker:" + tmp("avro-conf")
      val src = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      Tables.avroWrite(src, dir) // overwrite: staging + versioned publish
      Tables.avroWrite(src.filter($"id" === 1L), dir, overwrite = false)
      val back = Tables.avro(spark, dir) // inference + listing + scan
      assert(back.count() == 3L)
      assert(back.filter($"id" === 1L).count() == 2L)
      // second overwrite exercises the sweep of the previous version
      Tables.avroWrite(src.filter($"id" === 2L), dir)
      assert(Tables.avro(spark, dir).collect().map(_.getLong(0)).toSeq
        == Seq(2L))
    } finally {
      spark.conf.unset("fs.marker.impl")
      spark.conf.unset("fs.marker.impl.disable.cache")
    }
  }

  test("partition discovery: key=value dirs become typed columns, equality filters prune at the listing layer") {
    val root = tmp("avro-part")
    writeAvroFile(s"$root/region=EU/year=2024", "a.avro",
      Seq((1L, 10.0)).toDF("id", "v"))
    writeAvroFile(s"$root/region=EU/year=2025", "b.avro",
      Seq((2L, 20.0)).toDF("id", "v"))
    writeAvroFile(s"$root/region=US/year=2024", "c.avro",
      Seq((3L, 30.0)).toDF("id", "v"))
    val df = Tables.avro(spark, root)
    // data columns first, partition columns after, year inferred integral
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "region", "year"))
    assert(df.schema("region").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(df.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val all = df.select("id", "region", "year").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(all == Set((1L, "EU", 2024), (2L, "EU", 2025), (3L, "US", 2024)))
    // listing-layer pruning: one file per partition dir, so planned
    // input partitions count the files that survived the directory
    // filter — region=EU keeps 2 of 3, region=EU AND year=2024 keeps 1
    assert(df.rdd.getNumPartitions == 3)
    val eu = df.filter($"region" === "EU")
    assert(eu.rdd.getNumPartitions == 2)
    assert(eu.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val one = df.filter($"region" === "EU" && $"year" === 2024)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.select("id").head().getLong(0) == 1L)
    val in = df.filter($"region".isin("US", "XX"))
    assert(in.rdd.getNumPartitions == 1)
    assert(in.select("id").head().getLong(0) == 3L)
    // the pruned scan advertises the surviving file count
    assert(one.queryExecution.executedPlan.toString
      .contains("PartitionedFiles: 1"))
    // non-equality predicates stay with Spark and still evaluate right
    assert(df.filter($"year" >= 2025).select("id").head().getLong(0) == 2L)
  }

  test("range filters on partition columns prune at the listing layer") {
    // the retention-scan shape: day-partitioned lake, `day >= X` must
    // prune directories like an equality probe (r12 verdict: equality-
    // only pruning left date ranges scanning everything)
    val root = tmp("avro-range")
    for ((day, id) <- Seq("2024-01-01" -> 1L, "2024-02-01" -> 2L,
        "2024-03-01" -> 3L))
      writeAvroFile(s"$root/day=$day", s"d$id.avro",
        Seq((id, 1.0)).toDF("id", "v"))
    writeAvroFile(s"$root/day=__HIVE_DEFAULT_PARTITION__", "dn.avro",
      Seq((9L, 9.0)).toDF("id", "v"))
    val df = Tables.avro(spark, root)
    assert(df.rdd.getNumPartitions == 4)
    // string partition: lexicographic range — a null partition value
    // fails every comparison (SQL semantics), so it prunes too
    val recent = df.filter($"day" >= "2024-02-01")
    assert(recent.rdd.getNumPartitions == 2)
    assert(recent.select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    val window = df.filter($"day" > "2024-01-01" && $"day" < "2024-03-01")
    assert(window.rdd.getNumPartitions == 1)
    assert(window.select("id").head().getLong(0) == 2L)
    assert(window.queryExecution.executedPlan.toString
      .contains("PartitionedFiles: 1"))
    // null tests answered by the directory names
    assert(df.filter($"day".isNull).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(df.filter($"day".isNotNull).rdd.getNumPartitions == 3)

    // numeric partition: NUMERIC ordering, not lexicographic — year=9
    // must survive year >= 10 being false and year <= 2024 being true
    val nroot = tmp("avro-range-num")
    for (y <- Seq(9, 2024, 2025))
      writeAvroFile(s"$nroot/year=$y", s"y$y.avro",
        Seq((y.toLong, 1.0)).toDF("id", "v"))
    val ndf = Tables.avro(spark, nroot)
    assert(ndf.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val le = ndf.filter($"year" <= 2024)
    assert(le.rdd.getNumPartitions == 2)
    assert(le.select("id").collect().map(_.getLong(0)).toSet ==
      Set(9L, 2024L))
    assert(ndf.filter($"year" > 2024).select("id").head().getLong(0)
      == 2025L)
  }

  test("partition edge cases: __HIVE_DEFAULT_PARTITION__ is null; layout inconsistencies fail loudly") {
    val root = tmp("avro-part-null")
    writeAvroFile(s"$root/region=EU", "a.avro", Seq((1L, 1.0)).toDF("id", "v"))
    writeAvroFile(s"$root/region=__HIVE_DEFAULT_PARTITION__", "b.avro",
      Seq((2L, 2.0)).toDF("id", "v"))
    val df = Tables.avro(spark, root)
    val got = df.select("id", "region").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("EU")), (2L, None)))
    // a null partition never matches an equality (SQL semantics)
    assert(df.filter($"region" === "EU").count() == 1L)

    // non-partition subdirectory → loud, names the offender
    val badDir = tmp("avro-bad-subdir")
    writeAvroFile(s"$badDir/stuff", "a.avro", Seq((1L, 1.0)).toDF("id", "v"))
    val e1 = intercept[IllegalArgumentException] {
      Tables.avro(spark, badDir).collect()
    }
    assert(e1.getMessage.contains("unexpected subdirectory 'stuff'"))

    // files at mixed partition depths → loud
    val mixed = tmp("avro-mixed")
    writeAvroFile(mixed, "flat.avro", Seq((1L, 1.0)).toDF("id", "v"))
    writeAvroFile(s"$mixed/region=EU", "a.avro", Seq((2L, 2.0)).toDF("id", "v"))
    val e2 = intercept[IllegalArgumentException] {
      Tables.avro(spark, mixed).collect()
    }
    assert(e2.getMessage.contains("inconsistent partition layout"))
  }

  test("versioned overwrite: every crash state reads either old or new data in full, never a mix") {
    val dir = tmp("avro-ver")
    val oldDf = Seq((1L, "old"), (2L, "old")).toDF("id", "tag")
    val newDf = Seq((10L, "new")).toDF("id", "tag")
    Tables.avroWrite(oldDf, dir) // publishes data_v1
    assert(new java.io.File(s"$dir/data_v1").isDirectory)

    // crash BEFORE publish: task staging and the commit-stage dir both
    // populated, no data_v2 yet → old state fully readable
    writeAvroFile(s"$dir/_write_deadjob", "part-zombie.avro", newDf)
    writeAvroFile(s"$dir/_commit_deadjob", "part-staged.avro", newDf)
    val before = Tables.avro(spark, dir)
    assert(before.count() == 2L &&
      before.select("tag").distinct().head().getString(0) == "old")

    // crash AFTER publish, BEFORE sweep: data_v2 exists alongside
    // data_v1 and the staging debris → new state only
    writeAvroFile(s"$dir/data_v2", "part-new.avro", newDf)
    val after = Tables.avro(spark, dir)
    assert(after.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((10L, "new")))

    // the next overwrite self-heals: sweeps old versions and debris
    Tables.avroWrite(newDf, dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names == Set("data_v3"), names)
    assert(Tables.avro(spark, dir).count() == 1L)
  }

  test("append lands in the current version; legacy flat layout still appends flat") {
    val dir = tmp("avro-append")
    Tables.avroWrite(Seq((1L, "a")).toDF("id", "tag"), dir)
    Tables.avroWrite(Seq((2L, "b")).toDF("id", "tag"), dir, overwrite = false)
    assert(Tables.avro(spark, dir).count() == 2L)
    // both files live inside the version dir, not the root
    assert(new java.io.File(s"$dir/data_v1").listFiles()
      .count(_.getName.endsWith(".avro")) == 2)

    // pre-versioning flat layout (external data): append stays flat
    val flat = tmp("avro-flat")
    writeAvroFile(flat, "existing.avro", Seq((1L, "a")).toDF("id", "tag"))
    Tables.avroWrite(Seq((2L, "b")).toDF("id", "tag"), flat,
      overwrite = false)
    assert(new java.io.File(flat).listFiles()
      .count(_.getName.endsWith(".avro")) == 2)
    assert(Tables.avro(spark, flat).count() == 2L)
  }

  test("overwrite with an empty frame is a truncate: version flips, table reads empty with schema") {
    val dir = tmp("avro-empty")
    val src = Seq((1L, "a")).toDF("id", "tag")
    Tables.avroWrite(src, dir)
    assert(Tables.avro(spark, dir).count() == 1L)
    // overwrite with zero rows: the publish still flips the version and
    // sweeps the old data (truncate semantics), and because every task
    // writes its container header even with no records, the empty
    // table stays READABLE with its schema — zero rows, not an error
    Tables.avroWrite(src.filter($"id" < 0L), dir)
    val versions = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("data_v")).toSeq
    assert(versions == Seq("data_v2"), versions)
    val back = Tables.avro(spark, dir)
    assert(back.count() == 0L)
    assert(back.schema.fieldNames.toSeq == Seq("id", "tag"))

    // a zero-PARTITION frame runs no write tasks at all (no header-
    // writing tasks to lean on) — commit itself must stage the
    // schema-carrying file, or the published version directory is
    // empty and every later read fails "no .avro files"
    val zp = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      src.schema)
    assert(zp.rdd.getNumPartitions == 0)
    Tables.avroWrite(zp, dir)
    val v3 = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("data_v")).toSeq
    assert(v3 == Seq("data_v3"), v3)
    val empty = Tables.avro(spark, dir)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "tag"))
  }

  test("schema drift across files: missing nullable column resolves to null, extra column is skipped") {
    val dir = tmp("avro-drift")
    // the alphabetically-first file carries the table schema (id, tag, v)
    writeAvroFile(dir, "a_full.avro",
      Seq((1L, Some("a"), 1.5)).toDF("id", "tag", "v"))
    // a later file LACKS the nullable tag column → resolves to null
    writeAvroFile(dir, "z_missing.avro",
      Seq((2L, 2.5)).toDF("id", "v"))
    // and one carries an EXTRA column → skipped at decode
    writeAvroFile(dir, "z_extra.avro",
      Seq((3L, Some("c"), 3.5, 99L)).toDF("id", "tag", "v", "extra"))
    val df = Tables.avro(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag", "v"))
    val got = df.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(got == Seq((1L, Some("a"), 1.5), (2L, None, 2.5),
      (3L, Some("c"), 3.5)))
    // pruning a drifted column still decodes (reader schema keeps the
    // default needed by the file that lacks it)
    assert(df.select("tag").collect().map(r => Option(r.getString(0))).toSet
      == Set(Some("a"), None, Some("c")))
  }

  test("timestamp-millis rescales to micros at any nesting depth") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val millis = LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val inner = SchemaBuilder.record("Inner").fields()
      .name("ms").`type`(millis).noDefault()
      .endRecord()
    val schema = SchemaBuilder.record("R").fields()
      .requiredLong("id")
      .name("top_ms").`type`(millis).noDefault()
      .name("nested").`type`(inner).noDefault()
      .name("xs").`type`().array().items(millis).noDefault()
      .endRecord()
    val dir = tmp("avro-millis")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "m.avro"))
    val r = new GenericData.Record(schema)
    val in = new GenericData.Record(inner)
    in.put("ms", 1700000000123L)
    r.put("id", 1L)
    r.put("top_ms", 1700000000001L)
    r.put("nested", in)
    r.put("xs", java.util.Arrays.asList(Long.box(1700000000456L)))
    w.append(r)
    w.close()
    val got = Tables.avro(spark, dir)
      .select(unix_micros($"top_ms").as("t"),
        unix_micros($"nested.ms").as("n"),
        unix_micros(element_at($"xs", 1)).as("x"))
      .head()
    assert(got.getLong(0) == 1700000000001000L)
    assert(got.getLong(1) == 1700000000123000L)
    assert(got.getLong(2) == 1700000000456000L)
  }
}
