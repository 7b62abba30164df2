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

  // ---------------------------------------------------------------------
  // Feature-extract / resize / frame-sample — same per-partition batch
  // shape as decodeMeta; codec bodies are deterministic STUBS (no media
  // libraries in this environment), signatures and schemas are real.
  // ---------------------------------------------------------------------

  private def fold(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    payload.foreach(b => h = h * 31 + b)
    h
  }

  /** STUB feature extractor: payload → fixed-size float vector (a real
    * one runs a vision/audio encoder per partition-initialized model).
    * Output schema (id, embedding array<float>) plugs directly into
    * [[Similarity]] operators — that composition is the point.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col("id"), col("payload")).rdd.mapPartitions { it =>
      // model/codec init would happen here, once per partition
      it.map { r =>
        val h = fold(r.getAs[Array[Byte]]("payload"))
        val vec = Array.tabulate(dim)(i =>
          (math.floorMod(h >> (i * 7), 1000) / 1000.0f) - 0.5f)
        Row(r.getLong(0), vec.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: payload → payload' with target dims recorded. A real
    * implementation transforms bytes; the stub truncates/pads so output
    * size actually depends on the target — batch shape and schema real.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val target = math.max(16, (w * h) / 64)
    val rdd = media.select(col("id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), java.util.Arrays.copyOf(p, target), w, h)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB frame sampler: one video payload → every `stride`-th "frame"
    * (fixed-size byte slices), exploded to one row per frame — the
    * fan-out shape (id, frame_idx, frame payload) a real sampler yields.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select(col("id"), col("payload")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val nFrames = math.max(1, p.length / frameBytes)
        (0 until nFrames by stride).map { f =>
          val from = f * frameBytes
          Row(r.getLong(0), f,
            java.util.Arrays.copyOfRange(p, from,
              math.min(from + frameBytes, p.length)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
