package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition the rest of
  * `ext` exists for: quality screen → exact dedup → near-dup cluster
  * survivors → benchmark-contamination removal, emitting one row per
  * document with every verdict and the final keep decision. Each stage
  * is the already-tested operator; this wires them into the single pass
  * a 100 TB preparation job runs.
  *
  * All verdicts are computed (not short-circuited) so the output doubles
  * as an audit table: how many docs each filter would remove,
  * independently — the numbers a data-curation report needs.
  */
object CorpusPrep {

  /** @param docs   corpus with (doc_id, text)
    * @param evalDocs held-out eval set with (doc_id, text) — contamination
    *                 reference; pass an empty frame to skip
    * @return one row per doc: quality_ok, is_exact_dup (non-canonical
    *         copy), is_near_dup (non-survivor of its cluster),
    *         is_contaminated, and kept = all four pass
    */
  def prepare(docs: DataFrame, evalDocs: DataFrame,
              nearDupThreshold: Double = 0.5,
              contaminationMinShared: Int = 5): DataFrame = {
    // Quality: the same heuristics TextAnalysis.qualityScore applies.
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), (col("quality") === "good").as("quality_ok"))

    // Exact dedup: keep the lowest doc_id per content digest.
    val exactKeep = Dedup.dedupKeepFirst(docs)
      .select(col("keep_doc_id").as("doc_id"), lit(true).as("exact_canonical"))

    // Near-dup clusters: survivor = cluster minimum.
    val clusters = Dedup.nearDupClusters(docs, threshold = nearDupThreshold)
      .select(col("doc_id"), col("keep").as("near_dup_survivor"))

    // Contamination: any eval doc sharing enough n-grams taints the doc.
    val contaminated = Contamination
      .ngramOverlap(evalDocs, docs, minShared = contaminationMinShared)
      .select(col("train_id").as("doc_id")).distinct()
      .withColumn("is_contaminated", lit(true))

    docs.select("doc_id")
      .join(quality, Seq("doc_id"), "left_outer")
      .join(exactKeep, Seq("doc_id"), "left_outer")
      .join(clusters, Seq("doc_id"), "left_outer")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("quality_ok"), lit(false)).as("quality_ok"),
        (!coalesce(col("exact_canonical"), lit(false))).as("is_exact_dup"),
        (!coalesce(col("near_dup_survivor"), lit(true))).as("is_near_dup"),
        coalesce(col("is_contaminated"), lit(false)).as("is_contaminated"))
      .withColumn("kept",
        col("quality_ok") && !col("is_exact_dup") && !col("is_near_dup") &&
          !col("is_contaminated"))
      .orderBy("doc_id")
  }

  /** The curation report: per-filter removal counts plus the final
    * retention.
    */
  def report(prepared: DataFrame): DataFrame = prepared.agg(
    count(lit(1)).as("total_docs"),
    sum(when(!col("quality_ok"), 1L).otherwise(0L)).as("low_quality"),
    sum(when(col("is_exact_dup"), 1L).otherwise(0L)).as("exact_dups"),
    sum(when(col("is_near_dup"), 1L).otherwise(0L)).as("near_dups"),
    sum(when(col("is_contaminated"), 1L).otherwise(0L)).as("contaminated"),
    sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"))
}
