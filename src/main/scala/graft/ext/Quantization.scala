package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecSumAgg
import graft.functions.VectorFunctions.vec_dot

/** Product quantization (PQ) — the memory side of the ANN stack: each
  * embedding splits into `m` subvectors, each subvector is replaced by
  * the id of its nearest codeword in a per-subspace L2 codebook, and
  * search scores against the `m`-byte codes instead of the raw floats
  * (asymmetric distance computation, ADC). At 100 TB of embeddings the
  * raw vectors do not fit anywhere hot — 64 floats become `m` small
  * ints (16× smaller at m=4 before bit-packing), which is what lets a
  * candidate set live in memory next to an IVF cell ([[Similarity]]'s
  * coarse quantizer composes with this one: IVF prunes WHICH vectors
  * to score, PQ shrinks WHAT is scored).
  *
  * Scale shape: training iterates over (sub, code) aggregates — all
  * `m` subspaces update in ONE job per iteration (the subvector stream
  * explodes row-locally, then one hash-keyed aggregate over m·k
  * groups); the driver holds only the m×k×(dim/m) codebook, exactly
  * the [[Similarity.kmeansFit]] contract. Encoding and ADC scoring are
  * row-local expressions against broadcast codebook literals — the
  * nearest-codeword argmin reuses the codegen'd dot-argmax kernel
  * ([[graft.functions.IvfCellAssign]]) through the classic
  * extended-coordinate trick: argmin‖x−c‖² = argmax(x·c − ‖c‖²/2), so
  * appending 1.0 to the vector and −‖c‖²/2 to each codeword turns the
  * L2 argmin into the dot argmax the kernel already computes.
  */
object Quantization {

  private def subvec(embedding: Column, s: Int, dsub: Int): Column =
    slice(embedding, s * dsub + 1, dsub)

  private def extendBook(book: Seq[Seq[Float]]): Seq[Seq[Float]] =
    book.map(c => c :+ (-0.5 * c.map(x => x.toDouble * x).sum).toFloat)

  /** Nearest codeword by L2 distance, via the shared dot-argmax kernel
    * and the extended-coordinate reduction (first-best tie-break, like
    * every quantizer here).
    */
  private[ext] def codeFor(v: Column, book: Seq[Seq[Float]]): Column =
    Similarity.cellFor(concat(v, array(lit(1.0f))), extendBook(book))

  /** Train per-subspace L2 codebooks (m × k × dim/m), Lloyd iterations
    * with deterministic seeded init and keep-old-on-empty like
    * [[Similarity.kmeansFit]]; the update is mean = fixed-point sum /
    * count, so the result is partition-invariant.
    */
  def pqTrain(emb: DataFrame, m: Int = 4, k: Int = 16, iters: Int = 4,
              dim: Int = 64, seed: Long = 11L): Seq[Seq[Seq[Float]]] = {
    val dsub = dim / m
    require(m * dsub == dim, s"dim=$dim must split into m=$m subspaces")
    var books: Seq[Seq[Seq[Float]]] =
      (0 until m).map(s => Similarity.centroids(k, dsub, seed + s))
    for (_ <- 0 until iters) {
      val parts = (0 until m).map { s =>
        struct(lit(s).as("sub"),
          codeFor(subvec(col("embedding"), s, dsub), books(s)).as("code"),
          subvec(col("embedding"), s, dsub).as("v"))
      }
      val sums = emb
        .select(explode(array(parts: _*)).as("a"))
        .select(col("a.sub"), col("a.code"), col("a.v"))
        .groupBy("sub", "code")
        .agg(VecSumAgg.vec_sum_fixed(col("v"), dsub).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = sums.map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getSeq[Double](2), r.getLong(3))).toMap
      books = books.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (old, c) =>
          byKey.get((s, c)) match {
            case Some((sum, n)) if n > 0 => sum.map(x => (x / n).toFloat)
            case _ => old
          }
        }
      }
    }
    books
  }

  /** Replace each vector by its m codeword ids — the compressed form a
    * PQ index stores (row-local; the codebook rides in the expression).
    */
  def pqEncode(emb: DataFrame, books: Seq[Seq[Seq[Float]]],
               dim: Int = 64): DataFrame = {
    val m = books.length
    val dsub = dim / m
    emb.select(col("vec_id"), col("label"),
      array((0 until m).map(s =>
        codeFor(subvec(col("embedding"), s, dsub), books(s))): _*).as("codes"))
  }

  /** The PQ reconstruction x̂ (concatenated codewords) — the decode side
    * of the codec, used by the MSE convergence spec and recall drills.
    */
  def pqDecode(codes: Column, books: Seq[Seq[Seq[Float]]]): Column =
    concat(books.zipWithIndex.map { case (book, s) =>
      element_at(typedLit(book), codes.getItem(s) + 1)
    }: _*)

  /** ADC top-k: the query keeps its raw subvectors (asymmetric — only
    * the CORPUS side is quantized), each corpus vector contributes
    * Σ_s q_s · book_s[code_s] = q · x̂, computed as m codebook lookups
    * against broadcast literals — no raw corpus vectors are read past
    * the (pre-computable) encode step. Output is the approximate
    * inner-product ranking; recall vs the exact ranker is pinned in
    * QuantizationSpec and measured at scale in the drill.
    */
  def pqTopK(emb: DataFrame, books: Seq[Seq[Seq[Float]]], queryId: Long,
             k: Int, dim: Int = 64): DataFrame = {
    val m = books.length
    val dsub = dim / m
    val codes = pqEncode(emb, books, dim)
    val q = emb.filter(col("vec_id") === queryId)
      .select((0 until m).map(s =>
        subvec(col("embedding"), s, dsub).as(s"q$s")): _*)
    codes.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round((0 until m).map(s =>
            vec_dot(col(s"q$s"),
              element_at(typedLit(books(s)), col("codes").getItem(s) + 1)))
          .reduce(_ + _), 4).as("adc_ip"))
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(k)
  }

  /** The production pairing: the IVF coarse quantizer prunes WHICH
    * vectors are scored (only the query's `nprobe` nearest cells — at
    * scale, partition-pruned files, as in the persisted IVF index) and
    * PQ shrinks WHAT is scored (m codes per vector instead of raw
    * floats). Same contract as [[Similarity.annTopKIvf]], with the
    * scoring side swapped from raw-vector dots to ADC lookups — the
    * scored candidate set never touches a raw corpus vector.
    */
  def pqTopKIvf(emb: DataFrame, books: Seq[Seq[Seq[Float]]], queryId: Long,
                k: Int, dim: Int = 64, nlist: Int = 16,
                nprobe: Int = 2): DataFrame = {
    val m = books.length
    val dsub = dim / m
    val cs = Similarity.centroids(nlist, dim, 7L)
    val listed = emb.select(col("vec_id"), col("label"),
      Similarity.cellFor(col("embedding"), cs).as("cell"),
      array((0 until m).map(s =>
        codeFor(subvec(col("embedding"), s, dsub), books(s))): _*).as("codes"))
    val qScores = array(cs.map(c =>
      vec_dot(col("embedding"), typedLit(c))): _*)
    val q = emb.filter(col("vec_id") === queryId)
      .select((0 until m).map(s =>
          subvec(col("embedding"), s, dsub).as(s"q$s")) :+
        slice(reverse(array_sort(zip_with(qScores,
          sequence(lit(0), lit(nlist - 1)),
          (s, i) => struct(s.as("s"), i.as("i"))))), 1, nprobe)
          .getField("i").as("probe_cells"): _*)
    listed.join(broadcast(q),
        array_contains(col("probe_cells"), col("cell")))
      .select(col("vec_id"), col("label"),
        round((0 until m).map(s =>
            vec_dot(col(s"q$s"),
              element_at(typedLit(books(s)), col("codes").getItem(s) + 1)))
          .reduce(_ + _), 4).as("adc_ip"))
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(k)
  }
}
