package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Subword-vocabulary induction: byte-pair-encoding merge learning and
  * the token accounting a training pipeline derives from it — the step
  * between corpus curation ([[CorpusPrep]]) and sequence packing
  * ([[Sampling]]`.packSequences`) that decides what "a token" IS.
  *
  * Scale shape — the one move that makes distributed BPE tractable is
  * the same one production trainers use: train on the WORD HISTOGRAM,
  * not the corpus. The corpus is scanned exactly once (one word-count
  * aggregate); every merge iteration then runs over the distinct-word
  * frame, which is vocabulary-bounded (~10⁷ rows for web text — five
  * orders of magnitude under a 100 TB corpus) and SHRINKS as merges
  * fuse characters. Per iteration the shuffle carries (pair, partial
  * count) after map-side combine, and the driver receives exactly ONE
  * row (the argmax pair) — the same bounded-driver-state contract as
  * [[Similarity]]'s k×dim centroid matrix. Lineage is truncated every
  * few iterations ([[Checkpoints]]) so the plan never replans its
  * merge history.
  */
object Vocab {

  /** Greedy leftmost single-merge application: every non-overlapping
    * adjacent (l, r) becomes l+r in one left-to-right pass — the
    * standard BPE apply rule ("aaa" under (a,a) → ["aa", "a"]).
    */
  private[ext] def mergeOnce(toks: IndexedSeq[String], l: String,
                             r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toIndexedSeq
  }

  private[ext] def applyMerges(word: IndexedSeq[String],
                               merges: Seq[(String, String)]): IndexedSeq[String] =
    merges.foldLeft(word) { case (t, (l, r)) => mergeOnce(t, l, r) }

  /** The whitespace word histogram all of this trains on: one corpus
    * scan, one shuffle, vocabulary-sized output.
    */
  private def wordCounts(docs: DataFrame): DataFrame =
    Parallelism.widen(docs.select(col("text")))
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn the top-`k` BPE merges: (rank, left, right, pair_count),
    * rank 1 = most frequent pair at learn time. Deterministic — ties
    * break on (left, right) lexicographically. Stops early when the
    * best remaining pair's corpus frequency falls under
    * `minPairCount`. Characters are the initial symbols (word-internal
    * only: BPE never merges across the whitespace boundary, because
    * pairs are generated within each word's token array). `split` on
    * the empty pattern is per-Java-char, so astral code points would
    * split into surrogate halves — fine for the corpora here; a
    * byte-level variant would pre-encode to bytes instead.
    *
    * Each iteration is one job over the cached word frame: in-place
    * adjacent-pair generation (array lambdas — no self-join, the pair
    * stream never leaves its row before the hash aggregate), a
    * map-side-combined count, and a 1-row TakeOrdered to the driver.
    * The merge is then applied per word via a compiled map (row-local,
    * linear in word length) and the frame re-cached; the previous
    * cache is dropped and lineage truncated every 6 rounds
    * (`reliable` selects the durable checkpoint flavor for cluster
    * runs, as in [[Graph.pageRank]]).
    */
  def learnBpeMerges(docs: DataFrame, k: Int, minPairCount: Long = 2L,
                     reliable: Boolean = false,
                     driverVocabLimit: Long = 200000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The iteration frame is vocabulary-sized (≈10⁷ rows × a short
    // array at web scale — low GB), so it does NOT want the corpus
    // scan's partitioning: k rounds each pay per-task scheduling on
    // every partition. Locally the win is modest (~150 ms/round is
    // planning + stage launch, not tasks — measured 3.2 → 3.0 s for
    // 20 rounds at sf0.1), but on a cluster 20 rounds × thousands of
    // corpus-width tasks over a GB-scale frame is pure overhead; 8
    // partitions comfortably fits a 10⁷-word histogram.
    var words: Dataset[(Seq[String], Long)] = wordCounts(docs)
      .coalesce(8)
      .select(split(col("w"), "").as("toks"), col("cnt"))
      .as[(Seq[String], Long)].cache()
    // Small-histogram fast path ([[Dedup.connectedComponents]]'
    // driverEdgeLimit pattern): the merge loop is SEQUENTIAL by nature —
    // k rounds of (argmax job + remap + re-cache) each pay planning,
    // codegen and stage-launch latency on the driver (measured: the
    // k = 16 registered queries spend ~3.9 s in BETWEEN-job driver time
    // at sf0.1, more than the jobs themselves). Below `driverVocabLimit`
    // DISTINCT words the histogram is bounded metadata (200k words × a
    // short token array ≈ tens of MB — the same class as the budget-plan
    // and centroid collects), so the identical greedy loop runs on the
    // driver: same pair enumeration (every adjacent occurrence), same
    // (count desc, left, right) argmax with UTF-8-byte tie order (what
    // Spark's string ordering compares), same minPairCount stop. The
    // distributed loop below stays the scale path (a 10⁷-word web vocab
    // exceeds the limit); 0 disables. VocabSpec pins fast ≡ distributed.
    val nWords = if (driverVocabLimit > 0) words.count() else Long.MaxValue
    if (nWords <= driverVocabLimit) {
      val local = words.collect()
      words.unpersist(false)
      return learnBpeMergesLocal(spark, local, k, minPairCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // The previous round's frame is freed only AFTER the argmax action
    // has materialized the current one (an eager unpersist would drop
    // the cache the lazy successor still reads from, and every round
    // would recompute its whole lineage back to the corpus scan).
    var toFree: Option[Dataset[(Seq[String], Long)]] = None
    var stop = false
    while (merges.length < k && !stop) {
      val top = words.toDF("toks", "cnt")
        .select(explode(expr(
          """transform(slice(toks, 1, size(toks) - 1), (x, ix) ->
            |  struct(x AS l, element_at(toks, ix + 2) AS r))""".stripMargin))
          .as("p"), col("cnt"))
        .groupBy("p.l", "p.r").agg(sum("cnt").as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1).collect()
      toFree.foreach(_.unpersist(false))
      toFree = None
      if (top.isEmpty || top(0).getLong(2) < minPairCount) stop = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((merges.length + 1, l, r, c))
        val prev = words
        val mapped = prev.map { case (toks, cnt) =>
          (mergeOnce(toks.toIndexedSeq, l, r): Seq[String], cnt)
        }
        // Checkpoint rounds: cache the frame FOR the checkpoint (a
        // reliable checkpoint() runs an eager count AND a write job —
        // uncached, the merge map would execute twice), then drop that
        // cache immediately — the returned Dataset reads checkpoint
        // storage, and holding the entry would leak one vocab-frame
        // copy per checkpoint.
        words =
          if ((merges.length % 6) == 0) {
            val c = mapped.cache()
            val t = Checkpoints.truncate(c, reliable)
            c.unpersist(false)
            t
          } else mapped.cache()
        toFree = Some(prev)
      }
    }
    toFree.foreach(_.unpersist(false))
    words.unpersist(false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** Unsigned UTF-8-byte lexicographic order — exactly what Spark's
    * UTF8String comparison (and therefore the distributed loop's
    * `orderBy(l, r)` tie-break) uses. Java's `String.compareTo` is
    * UTF-16 code-unit order, which diverges for supplementary code
    * points; the fast path must tie-break identically.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    ab.length < bb.length
  }

  /** [[learnBpeMerges]]' driver fast path: the identical greedy loop
    * over the collected (token-array, count) histogram. Kept private —
    * the gate in [[learnBpeMerges]] is the only entry.
    */
  private def learnBpeMergesLocal(spark: org.apache.spark.sql.SparkSession,
                                  hist: Array[(Seq[String], Long)], k: Int,
                                  minPairCount: Long): DataFrame = {
    import spark.implicits._
    var ws: Array[(IndexedSeq[String], Long)] =
      hist.map { case (t, c) => (t.toIndexedSeq, c) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var stop = false
    while (merges.length < k && !stop) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (t, c) =>
        var i = 0
        while (i + 1 < t.length) {
          val key = (t(i), t(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if bc > c || (bc == c &&
            (utf8Lt(bp._1, p._1) ||
              (bp._1 == p._1 && utf8Lt(bp._2, p._2)))) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          merges += ((merges.length + 1, l, r, c))
          ws = ws.map { case (t, cnt) => (mergeOnce(t, l, r), cnt) }
        case _ => stop = true
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** Collect a [[learnBpeMerges]] result into the rank-ordered merge
    * list [[bpeTokenCounts]] applies — k rows on the driver, the
    * learned artifact itself (what a tokenizer file stores).
    */
  def learnedMerges(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Per-document token accounting under a learned merge list: doc_id,
    * n_words, n_bpe_tokens — the sizing input for sequence packing and
    * training-cost estimates.
    *
    * Scale shape: the merge list is k pairs, broadcast; segmentation
    * runs ONCE per distinct word (vocabulary-sized frame, k·|word|
    * row-local work), and fans back to documents through a word-keyed
    * join of (doc, word, count) against (word, tokens-per-word) — the
    * corpus-sized side shuffles once and carries no token arrays, only
    * counts.
    */
  def bpeTokenCounts(docs: DataFrame,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val docWords = Parallelism.widen(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("n_w"))
    val wordLen = docWords.select("w").distinct().as[String]
      .map { w =>
        (w, applyMerges(w.split("").toIndexedSeq, bc.value).length.toLong)
      }.toDF("w", "toks_per_word")
    val counted = docWords.join(wordLen, "w")
      .groupBy("doc_id")
      .agg(sum("n_w").cast("bigint").as("n_words"),
        sum(col("n_w") * col("toks_per_word")).cast("bigint")
          .as("n_bpe_tokens"))
    // Empty / whitespace-only docs have no words but must still emit a
    // row (0, 0) — every per-doc operator here is total over its input.
    docs.select("doc_id").join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }
}
