package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED document-quality classification — the fastText/DCLM-style
  * discriminator pattern: fit a logistic probe over hashing-trick
  * token-count features to tell a target slice ("looks like the
  * reference corpus") from the rest, then score every document with
  * the learned model. [[Retrieval.linearQualityScore]] is the
  * inference half with FIXED weights; this module closes the loop and
  * learns them from a label column, entirely inside the engine.
  *
  * Why batch gradient descent and not an ML library: the training loop
  * is three aggregations per round over a feature stream the engine
  * already produces ([[Dedup.hashedShingles]]), so expressing it
  * declaratively keeps the 100-TB story explicit — per round, one
  * doc-keyed margin aggregation, one doc-keyed residual join (the same
  * exchange), and one K-keyed gradient aggregation whose result is K+1
  * rows. The model (K+1 weights) is driver-held and broadcast back as
  * an array literal, exactly the bounded-metadata pattern of the BPE
  * argmax and k-means centroid loops. No corpus data ever reaches the
  * driver.
  *
  * Conditioning: raw bag-of-counts features are dominated by the
  * document-length direction (every count grows with length), which
  * makes plain full-batch GD oscillate. The loop therefore scales each
  * bucket's gradient by the bucket's EXACT integer second moment
  * S2_k = Σ_d c_dk² (Jacobi preconditioning — equivalently, training on
  * features normalized to unit second moment). S2 is one aggregation
  * over the cached feature stream and rides back as a literal; since
  * c ≥ 1 implies Σc ≤ Σc², the scaled gradient is provably in (−1, 1),
  * which bounds every per-round weight step by lr·10⁶.
  *
  * Why the arithmetic looks the way it does — every operation on the
  * training path is either exact integer/decimal arithmetic or a
  * SINGLE correctly-rounded IEEE-754 double operation (+, −, ×, ÷,
  * abs), so the learned weights are bit-identical across engines and
  * partition layouts and the whole training run is DuckDB-oracle
  * checkable ([[graft.oracle.LogRegSql]] replays it in SQL):
  *   - weights are fixed-point longs (scale 10⁻⁶), so margins are
  *     exact integer dot products and their distributed sum is
  *     fold-order-free;
  *   - the sigmoid is the ALGEBRAIC logistic σ(m) = 1/2 +
  *     m / (2·(1+|m|)) — same sign, same monotonicity, same [0,1]
  *     range and 1/2-at-0 as the exponential form, but built only
  *     from correctly-rounded ops (exp is not);
  *   - per-row gradient terms round to DECIMAL(27,12) before the sum,
  *     making the reduction fold-order-proof (the repo-wide decimal-
  *     sum rule);
  *   - the weight step rounds back to fixed-point half-up, in exact
  *     BigDecimal on the driver and the identical decimal ROUND in the
  *     oracle (both round half away from zero).
  *
  * Reference scope: the reference pipeline has no trained model at all
  * (`database_handler.py`, `spark_consumer.py` are fixed-schema ETL);
  * this is part of the beyond-reference LLM-curation layer, next to
  * [[TextAnalysis.dsirWeights]] (generative likelihood-ratio
  * selection) as its discriminative sibling.
  */
object Classifier {

  /** Fixed-point scale for weights: 10⁻⁶ per unit. */
  val WeightScale = 1000000L

  /** Hashed unigram feature rows `(doc_id, k, c, n, y)`:
    * `k = pmod(xxh64-shingle-hash, buckets)`, `c` the bucket's token
    * count, with one extra bias feature `k = buckets, c = 1`; `n` the
    * document token count (carried for reporting), `y` the 0/1 label.
    * `buckets` must be a power of two — the oracle's unsigned mod only
    * equals Spark's signed pmod when 2⁶⁴ ≡ 0 (mod buckets), the same
    * contract as [[TextAnalysis.dsirWeights]].
    */
  def logregFeatures(docs: DataFrame, label: Column,
                     buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val base = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"),
      label.cast("double").as("y"))
    val counts = Dedup.hashedShingles(docs, 1)
      .select(col("doc_id"), pmod(col("h"), lit(buckets.toLong)).as("k"))
      .groupBy("doc_id", "k").agg(count(lit(1)).as("c"))
    counts
      .unionByName(base.select(col("doc_id"),
        lit(buckets.toLong).as("k"), lit(1L).as("c")))
      .join(base, Seq("doc_id"))
  }

  /** Learned fixed-point weights after `iters` rounds of
    * second-moment-preconditioned full-batch gradient descent from
    * zero init: `buckets + 1` entries (index `buckets` is the bias).
    * `lr` must be an exact decimal literal (it multiplies exact
    * decimals in both engines); `lr · 10⁶` must be integral so the
    * oracle can carry it as one literal factor.
    *
    * Per round: ĝ_k = Σ_d (σ(m_d) − y_d) · c_dk / S2_k with margin
    * m_d = (Σ_k w_k·c_dk) / 10⁶ and S2_k = Σ_d c_dk²; then
    * w_k ← w_k − round(ĝ_k · lr · 10⁶). The per-row c/S2 divides two
    * exact integers (one rounding); r·(c/S2) is the second and last
    * double rounding before the decimal cast.
    */
  def trainLogReg(docs: DataFrame, label: Column, buckets: Int = 256,
                  iters: Int = 16,
                  lr: BigDecimal = BigDecimal("0.5")): Array[Long] = {
    require((lr * WeightScale).isWhole,
      s"lr * $WeightScale must be integral, got $lr")
    val feats = logregFeatures(docs, label, buckets).cache()
    try {
      // Exact Jacobi preconditioner: ≤ buckets+1 rows of bounded
      // metadata, like the k-means centroid collects.
      val s2 = Array.fill(buckets + 1)(0L)
      feats.groupBy("k").agg(sum(col("c") * col("c")).as("s2")).collect()
        .foreach(r => s2(r.getLong(0).toInt) = r.getLong(1))
      require(s2(buckets) > 0, "trainLogReg: no documents carry features")
      val s2Lit = typedLit(s2.toSeq)
      val w = Array.fill(buckets + 1)(0L)
      var round = 0
      while (round < iters) {
        val wLit = typedLit(w.toSeq)
        val margins = feats.groupBy("doc_id")
          .agg(sum(element_at(wLit, col("k").cast("int") + 1) * col("c"))
            .as("s"), first("y").as("y"))
        val resid = margins.select(col("doc_id"),
          (sigmaOf(col("s")) - col("y")).as("r"))
        val grad = feats.join(resid, Seq("doc_id"))
          .select(col("k"),
            (col("r") * (col("c").cast("double") /
              element_at(s2Lit, col("k").cast("int") + 1).cast("double")))
              .cast("decimal(27,12)").as("t"))
          .groupBy("k").agg(sum("t").as("g"))
          .collect()
        grad.foreach { row =>
          val k = row.getLong(0).toInt
          val g = BigDecimal(row.getDecimal(1))
          val step = (g * lr * BigDecimal(WeightScale))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
          w(k) = w(k) - step
        }
        round += 1
      }
      w
    } finally feats.unpersist(false)
  }

  /** The trained model as a frame: `(k, weight_fp)` ordered by bucket —
    * the artifact a pipeline persists next to the corpus snapshot.
    */
  def trainedWeights(docs: DataFrame, label: Column, buckets: Int = 256,
                     iters: Int = 16,
                     lr: BigDecimal = BigDecimal("0.5")): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = trainLogReg(docs, label, buckets, iters, lr)
    w.toSeq.zipWithIndex.map { case (v, k) => (k.toLong, v) }
      .toDF("k", "weight_fp").orderBy("k")
  }

  /** Every document scored under a trained (or supplied) model:
    * `(doc_id, n_tokens, y, p, keep)` with `p = round(σ(margin), 6)`
    * and `keep` decided on the UNROUNDED probability — the
    * train-then-screen composite a curation pipeline runs. One
    * doc-keyed aggregation over the feature stream; the model rides as
    * an array literal inside codegen.
    */
  def logregScore(docs: DataFrame, label: Column, weights: Array[Long],
                  buckets: Int): DataFrame = {
    require(weights.length == buckets + 1,
      s"weights must have ${buckets + 1} entries, got ${weights.length}")
    val wLit = typedLit(weights.toSeq)
    logregFeatures(docs, label, buckets).groupBy("doc_id")
      .agg(sum(element_at(wLit, col("k").cast("int") + 1) * col("c"))
        .as("s"), first("n").as("n"), first("y").as("y"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("y").cast("long").as("y"),
        round(sigmaOf(col("s")), 6).as("p"),
        (sigmaOf(col("s")) >= 0.5).as("keep"))
      .orderBy("doc_id")
  }

  /** Train on the documents' own label column and score them — the
    * registered-query composite. */
  def trainAndScore(docs: DataFrame, label: Column, buckets: Int = 256,
                    iters: Int = 16,
                    lr: BigDecimal = BigDecimal("0.5")): DataFrame =
    logregScore(docs, label, trainLogReg(docs, label, buckets, iters, lr),
      buckets)

  /** σ(s/10⁶) under the algebraic logistic: only correctly-rounded
    * double ops, so both engines produce the identical bit pattern. */
  private def sigmaOf(s: Column): Column = {
    val m = s.cast("double") / lit(1.0e6)
    lit(0.5) + m / (lit(2.0) * (lit(1.0) + abs(m)))
  }
}
