package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.2 PR 5): media payloads travel as
  * opaque `binary` columns with typed metadata alongside. The Spark-side
  * shape — schema, partitioning, per-partition batch decode — is real and
  * tested; the actual codec step is STUBBED (no image/audio libraries in
  * this environment) behind [[fakeDecode]], a deterministic stand-in with
  * the same signature a real decoder would have.
  */
object Multimodal {

  /** Metadata struct a decode step yields per media object. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Cheap expression-level metadata over a binary column: length +
    * content digest. This is the *real* path for header-only metadata.
    */
  def binaryMeta(docs: DataFrame): DataFrame = docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).as("byte_len"),
      sha2(col("text"), 256).as("sha256"))
    .orderBy("doc_id")

  /** STUB — deterministic fake decode. A real implementation would parse
    * the container header (JPEG/PNG/WAV…) from the payload bytes; this
    * derives plausible dimensions from a stable content hash so tests are
    * reproducible. Signature and batch shape match the real thing.
    */
  def fakeDecode(payload: Array[Byte]): Row = {
    var h = 1125899906842597L // deterministic FNV-ish fold, not hashCode
    payload.foreach(b => h = h * 31 + b)
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val fmt = if (math.floorMod(h, 2) == 0L) "jpeg" else "png"
    Row(payload.length, w, ht, fmt)
  }

  /** Per-partition batch decode: binary payloads → metadata structs. This
    * is the distributed shape a real decoder plugs into — `mapPartitions`
    * amortizes codec init per partition (per-executor-core), and the
    * payload column is dropped as early as possible afterwards. Input must
    * have (id: long, payload: binary).
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: mediaMetaSchema.fields.toSeq)
    val rdd = media.select(col("id"), col("payload")).rdd.mapPartitions { it =>
      // Real codecs would initialize their native context HERE, once per
      // partition, then stream batches through it.
      it.map { r =>
        val meta = fakeDecode(r.getAs[Array[Byte]]("payload"))
        Row.fromSeq(r.getLong(0) +: meta.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build a media-shaped frame from the documents table (text bytes stand
    * in for image payloads) — the test fixture for the plumbing above.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("id"),
    col("text").cast("binary").as("payload"))
}
