package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the layer a
  * data-curation pipeline uses on its OWN derived graphs (the near-dup
  * similarity graph, the contamination overlap graph): centrality picks
  * representative documents, degree screens hub artifacts.
  *
  * Same scale discipline as [[Dedup.connectedComponents]]: the edge
  * list is checkpointed once and re-joined per iteration (lineage stays
  * flat), every per-vertex reduction is a keyed aggregate of 8-byte
  * ids, rank mass aggregates through DECIMAL so results are partition-
  * invariant, and iteration count is FIXED — the driver never loops on
  * a data-dependent condition it cannot bound.
  */
object Graph {

  /** Undirected degree per vertex — one symmetrize + one aggregate. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** PageRank with `iters` fixed power iterations at damping `d` on the
    * symmetrized graph (similarity graphs are undirected). Per
    * iteration: one join of the edge list against current ranks and one
    * per-dst aggregate — contributions rank/degree enter as
    * DECIMAL(27,12) so the sum is fold-order-free and two runs of the
    * same graph produce bit-identical ranks. Dangling mass is not an
    * issue on a symmetrized graph (every vertex has degree ≥ 1).
    *
    * Driver state: nothing but the loop counter; ranks stay
    * distributed, checkpointed per iteration to truncate lineage.
    * `reliable = true` switches the truncations to durable
    * `checkpoint()` so iteration state survives executor loss on a real
    * cluster — see [[Checkpoints.truncate]] for the exact semantics.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85,
               reliable: Boolean = false): DataFrame = {
    val ckpt = (df: DataFrame) => Checkpoints.truncate(df, reliable)
    val sym = ckpt(edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))))
    val deg = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))
    val n = deg.count()
    val out = ckpt(sym.join(deg, sym("src") === deg("id"))
      .select(col("src"), col("dst"), col("degree")))
    var ranks = deg.select(col("id"), lit(1.0 / n).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = out.join(ranks, out("src") === ranks("id"))
        .select(col("dst"),
          (col("rank") / col("degree")).cast("decimal(27,12)").as("c"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).cast("double").as("mass"))
      ranks = contrib
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * col("mass"))
            .as("rank"))
      // Lineage grows linearly with the (fixed, small) iteration count;
      // truncate only on long runs so short fits stay one lazy plan —
      // each eager checkpoint is an extra Spark job.
      if (i % 5 == 4) ranks = ckpt(ranks)
      i += 1
    }
    ranks.select(col("id"), round(col("rank"), 8).as("rank"))
      .orderBy(col("rank").desc, col("id"))
  }

  /** Centrality-ranked representatives of the document near-dup graph:
    * PageRank over [[Similarity.nearDupPairs]] edges — within a cluster
    * of near-duplicates, the highest-rank member is the most-connected
    * (most "canonical") copy, a principled keep-choice where min-id is
    * arbitrary. Returns the top `k` vertices.
    */
  def topCentralDocs(pairs: DataFrame, k: Int = 20): DataFrame =
    pageRank(pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")))
      .limit(k)
      .select(col("id").as("vec_id"), col("rank"))
}
