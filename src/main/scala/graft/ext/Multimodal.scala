package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.2 PR 5): media payloads travel as
  * opaque `binary` columns with typed metadata alongside. The Spark-side
  * shape — schema, partitioning, per-partition batch decode — is real and
  * tested; the actual codec step is STUBBED (no image/audio libraries in
  * this environment) behind [[fakeDecode]], a deterministic stand-in with
  * the same signature a real decoder would have.
  *
  * Execution shape: every codec stage is a TYPED `Dataset.mapPartitions`
  * — one `DeserializeToObject → MapPartitions → SerializeFromObject`
  * island inside the regular Dataset plan, so column pruning still
  * reaches the scan below and whole-stage codegen resumes immediately
  * above (the earlier RDD round-trip formulation severed the plan in two
  * and kept everything downstream off codegen). Per-partition codec/model
  * init lives in the mapPartitions closure, once per partition.
  */
object Multimodal {

  /** Typed record of a decode step's per-object metadata. */
  case class DecodedMeta(id: Long, byte_len: Int, width: Int, height: Int,
                         format: String)

  /** Typed record of a feature-extraction step's output; `embedding`
    * encodes as `array<float>`, plugging directly into [[Similarity]].
    */
  case class MediaFeatures(id: Long, embedding: Array[Float])

  /** Typed record of a resize step's output. */
  case class ResizedMedia(id: Long, payload: Array[Byte], width: Int,
                          height: Int)

  /** Typed record of a frame-sampling step's fan-out output. */
  case class SampledFrame(id: Long, frame_idx: Int, frame: Array[Byte])

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
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val h = fold(payload)
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val fmt = if (math.floorMod(h, 2) == 0L) "jpeg" else "png"
    (payload.length, w, ht, fmt)
  }

  /** Per-partition batch decode: binary payloads → metadata records. This
    * is the distributed shape a real decoder plugs into — `mapPartitions`
    * amortizes codec init per partition (per-executor-core), and the
    * payload column is dropped as early as possible afterwards. Input must
    * have (id: long, payload: binary).
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Real codecs would initialize their native context HERE, once
        // per partition, then stream batches through it.
        it.map { case (id, p) =>
          val (len, w, h, fmt) = fakeDecode(p)
          DecodedMeta(id, len, w, h, fmt)
        }
      }
      .toDF()
  }

  /** Build a media-shaped frame from the documents table (text bytes stand
    * in for image payloads) — the test fixture for the plumbing above.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("id"),
    col("text").cast("binary").as("payload"))

  // ---------------------------------------------------------------------
  // Feature-extract / resize / frame-sample — same per-partition typed
  // batch shape as decodeMeta; codec bodies are deterministic STUBS (no
  // media libraries in this environment), signatures and schemas are real.
  // ---------------------------------------------------------------------

  private def fold(payload: Array[Byte]): Long = {
    var h = 1125899906842597L // deterministic FNV-ish fold, not hashCode
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
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model/codec init would happen here, once per partition
        it.map { case (id, p) =>
          val h = fold(p)
          MediaFeatures(id, Array.tabulate(dim)(i =>
            (math.floorMod(h >> (i * 7), 1000) / 1000.0f) - 0.5f))
        }
      }
      .toDF()
  }

  /** STUB resize: payload → payload' with target dims recorded. A real
    * implementation transforms bytes; the stub truncates/pads so output
    * size actually depends on the target — batch shape and schema real.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    val target = math.max(16, (w * h) / 64)
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          ResizedMedia(id, java.util.Arrays.copyOf(p, target), w, h)
        }
      }
      .toDF()
  }

  /** STUB frame sampler: one video payload → every `stride`-th "frame"
    * (fixed-size byte slices), exploded to one row per frame — the
    * fan-out shape (id, frame_idx, frame payload) a real sampler yields.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val nFrames = math.max(1, p.length / frameBytes)
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * frameBytes
            SampledFrame(id, f,
              java.util.Arrays.copyOfRange(p, from,
                math.min(from + frameBytes, p.length)))
          }
        }
      }
      .toDF()
  }
}
