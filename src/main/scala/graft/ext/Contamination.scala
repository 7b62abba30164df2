package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which training documents share
  * enough word n-grams with an evaluation set to suggest leakage — the
  * standard pre-training hygiene check (e.g. 3-gram overlap screens).
  *
  * Shape at 100 TB: an inverted-index join keyed on the n-gram — the
  * shuffle carries (doc, gram) pairs, never document pairs, so cost
  * tracks postings, not |eval|·|train|. Ubiquitous grams ("of the and")
  * would both blow up the join and carry no signal, so grams above a
  * training-corpus document-frequency cap are dropped first — the same
  * stop-gram pruning production screens use. Grams are the compiled
  * 64-bit hashed-shingle stream ([[Dedup.hashedShingles]] — 2.5× the
  * string-gram explode at sf0.1, no gram strings shuffled); the output
  * carries only overlap COUNTS, which equal string-gram counts modulo
  * negligible 64-bit collisions, so the operator stays oracle-checkable
  * against a string-gram SQL twin.
  */
object Contamination {

  /** Pairs (eval doc, train doc) sharing at least `minShared` distinct
    * word `n`-grams, counting only grams contained in at most `dfCap`
    * training documents.
    *
    * `trainShingles`, when supplied, MUST be a [[Dedup.hashedShingles]]
    * stream built with the SAME `n` as this call — the eval side hashes
    * its own `n`-grams, and a mismatched gram size silently yields zero
    * overlap (nothing flagged) rather than an error, the worst failure
    * mode for a hygiene screen. Callers passing a pre-built stream must
    * pass its gram size via `trainShinglesN` so the invariant is checked.
    */
  def ngramOverlap(eval: DataFrame, train: DataFrame, n: Int = 3,
                   minShared: Int = 5, dfCap: Int = 20,
                   trainShingles: Option[DataFrame] = None,
                   trainShinglesN: Option[Int] = None): DataFrame = {
    trainShingles.foreach { _ =>
      val tn = trainShinglesN.getOrElse(throw new IllegalArgumentException(
        "trainShingles supplied without trainShinglesN: declare the gram " +
          "size the stream was built with (must equal n)"))
      require(tn == n, s"trainShingles built with n=$tn but eval side " +
        s"shingles with n=$n: overlap would be silently zero")
    }
    def grams(df: DataFrame, idAs: String) = Dedup.hashedShingles(df, n)
      .select(col("doc_id").as(idAs), col("h").as("sh"))
      .distinct()
    def gramsFrom(sh: DataFrame, idAs: String) = sh
      .select(col("doc_id").as(idAs), col("h").as("sh"))
      .distinct()
    // Single pipeline: the df cap is a count window over the SAME gram
    // stream the join consumes — one shuffle on the gram, no second plan
    // branch re-running the shingle flatMap + distinct (the pattern the
    // minhashNearDupPairs rewrite exists to avoid).
    val trainRare = trainShingles.map(gramsFrom(_, "train_id"))
      .getOrElse(grams(train, "train_id"))
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("df") <= dfCap)
      .drop("df")
    grams(eval, "eval_id")
      .join(trainRare, "sh")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .orderBy("eval_id", "train_id")
  }

  /** The per-document DECISION the overlap screen exists to feed: the
    * training corpus with every document flagged against ANY eval doc
    * removed — what a pre-training pipeline actually materializes
    * (the screened corpus), not just the pair report.
    *
    * `train` must carry a `doc_id` column (it is the join identity the
    * flag list anchors to). Shape at 100 TB: [[ngramOverlap]]'s
    * inverted-index join produces the flag list — tiny relative to the
    * corpus (it is bounded by the eval set's gram postings) — then ONE
    * doc_id-keyed anti-join removes the flagged docs; the corpus
    * shuffles at most once and the flag side is broadcast-sized by
    * construction, so the screen costs one corpus scan more than the
    * report it derives from.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 3,
                    minShared: Int = 5, dfCap: Int = 20): DataFrame = {
    val flagged = ngramOverlap(eval, train, n, minShared, dfCap)
      .select(col("train_id").as("doc_id")).distinct()
    train.join(flagged, Seq("doc_id"), "left_anti")
  }
}
