package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Similarity search over an embedding column (`array<float>`) — SURVEY
  * §7.2 PR 5. Brute-force cosine top-k is the exact baseline; the scale
  * path is random-hyperplane LSH bucketing so a 100 TB corpus only
  * brute-forces within (multiprobed) buckets.
  *
  * The inner loop is [[graft.functions.FloatVecDot]] — a custom Catalyst
  * expression with whole-stage codegen (the built-in `zip_with` +
  * `aggregate` chain is interpreted and allocates per row; on the pair
  * join it was the bench bottleneck). Norms are projected **once per
  * vector** before any pair join, never recomputed per pair.
  */
object Similarity {

  /** Codegen'd dot product, accumulated in double in list order. */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  /** L2 norm via the same kernel. */
  def norm(a: Column): Column = vec_norm(a)

  /** Cosine similarity (safe for non-normalized inputs). Prefer the
    * precomputed-norm forms below for anything pairwise.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector sanity statistics (norm / mean / max component). */
  def embedStats(emb: DataFrame): DataFrame = emb.select(
      col("vec_id"),
      col("label"),
      round(vec_norm(col("embedding")), 4).as("l2_norm"),
      round(aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (acc, v) => acc + v) / size(col("embedding")), 4)
        .as("mean_component"),
      round(array_max(col("embedding")).cast("double"), 4).as("max_component"))
    .orderBy("vec_id")

  /** Exact brute-force cosine top-k against one stored query vector: the
    * single-row query side is broadcast, so this is one scan of the corpus
    * with a TakeOrdered(k) — no shuffle of the corpus itself.
    */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"),
        vec_norm(col("embedding")).as("q_norm"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("embedding"), col("q_embedding")) /
          (vec_norm(col("embedding")) * col("q_norm")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // LSH-bucketed ANN (random hyperplane signs)
  // ---------------------------------------------------------------------

  /** Deterministic pseudo-random hyperplanes (seeded, so every executor —
    * and every round — derives identical planes).
    */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Float]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** Sign-bit bucket id of an embedding against the hyperplane set. */
  def lshBucket(embedding: Column, numPlanes: Int, dim: Int,
                seed: Long = 42L): Column = {
    val ps = planes(numPlanes, dim, seed)
    ps.zipWithIndex.map { case (p, i) =>
      shiftleft(when(vec_dot(embedding, typedLit(p)) >= 0, 1L).otherwise(0L), i)
    }.reduce(_ bitwiseOR _)
  }

  /** ANN top-k: bucket the corpus by hyperplane signs, then brute-force
    * cosine only inside buckets within Hamming distance `probe` of the
    * query's bucket (multiprobe LSH — recovers recall lost to bucket
    * boundaries without touching the whole corpus). The bucketing is a
    * plain projection — at scale the bucket column would be written as a
    * partition/bucket key so repeated queries prune to few buckets' files.
    */
  def annTopK(emb: DataFrame, queryId: Long, k: Int, numPlanes: Int = 8,
              dim: Int = 64, probe: Int = 1): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("label"), col("embedding"),
      lshBucket(col("embedding"), numPlanes, dim).as("bucket"),
      vec_norm(col("embedding")).as("nrm"))
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("bucket").as("q_bucket"), col("embedding").as("q_embedding"),
        col("nrm").as("q_norm"))
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q),
        bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= probe)
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("embedding"), col("q_embedding")) /
          (col("nrm") * col("q_norm")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // IVF-style ANN (coarse quantizer + probed inverted lists)
  // ---------------------------------------------------------------------

  /** Deterministic coarse centroids (seeded gaussian, L2-normalized). A
    * production build would k-means these; seeded planes keep every
    * executor and every round identical without an iterative fit.
    */
  private def centroids(k: Int, dim: Int, seed: Long): Seq[Seq[Float]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(k) {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
  }

  /** Index of the best-scoring centroid for an embedding. */
  def ivfCell(embedding: Column, k: Int, dim: Int, seed: Long = 7L): Column = {
    val scores = array(centroids(k, dim, seed)
      .map(c => vec_dot(embedding, typedLit(c))): _*)
    // array_position is 1-based; cells are 0-based
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** IVF ANN top-k: assign every vector to its nearest coarse centroid
    * (the inverted list), then brute-force only the `nprobe` lists
    * closest to the query. Same contract as [[annTopK]]; different
    * recall/latency trade — lists follow the data distribution where LSH
    * cuts blindly. At scale the cell id is the partition/bucket key.
    */
  def annTopKIvf(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
                 dim: Int = 64, nprobe: Int = 2): DataFrame = {
    val cs = centroids(nlist, dim, 7L)
    val listed = emb.select(col("vec_id"), col("label"), col("embedding"),
      ivfCell(col("embedding"), nlist, dim).as("cell"),
      vec_norm(col("embedding")).as("nrm"))
    // The query's nprobe best cells, as a broadcast single-row frame.
    val qScores = array(cs.map(c => vec_dot(col("embedding"), typedLit(c))): _*)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"),
        vec_norm(col("embedding")).as("q_norm"),
        slice(reverse(array_sort(zip_with(qScores,
          sequence(lit(0), lit(nlist - 1)),
          (s, i) => struct(s.as("s"), i.as("i"))))), 1, nprobe)
          .getField("i").as("probe_cells"))
    listed.join(broadcast(q), array_contains(col("probe_cells"), col("cell")))
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("embedding"), col("q_embedding")) /
          (col("nrm") * col("q_norm")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket — the
    * embedding analog of [[Dedup.minhashNearDupPairs]]: pairs form only
    * within buckets (a shuffle keyed on the bucket), never across the
    * full corpus.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                   numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), numPlanes, dim).as("bucket"),
      vec_norm(col("embedding")).as("nrm"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(vec_dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
