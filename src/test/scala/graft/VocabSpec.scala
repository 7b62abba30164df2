package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Vocab

/** BPE merge learning against an INDEPENDENT in-memory reference
  * implementation (written here, not shared with the operator) — the
  * iterative argmax has no ANSI-SQL oracle, so the spec IS the oracle.
  */
class VocabSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Straight-line reference BPE on a word histogram: count adjacent
    * pairs weighted by word frequency, take the (count desc, left,
    * right) argmax, apply greedy-leftmost, repeat.
    */
  private def refBpe(hist: Map[String, Long], k: Int,
                     minPairCount: Long): Seq[(Int, String, String, Long)] = {
    def merge1(t: List[String], l: String, r: String): List[String] = t match {
      case a :: b :: rest if a == l && b == r => (l + r) :: merge1(rest, l, r)
      case a :: rest => a :: merge1(rest, l, r)
      case Nil => Nil
    }
    var words = hist.toSeq.map { case (w, c) => (w.split("").toList, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    while (out.length < k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((toks, c) <- words; Seq(a, b) <- toks.sliding(2) if toks.length > 1)
        counts((a, b)) += c
      if (counts.isEmpty || counts.values.max < minPairCount) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((out.length + 1, l, r, c))
        words = words.map { case (t, n) => (merge1(t, l, r), n) }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    // Classic BPE toy distribution: "low lower lowest newer newest".
    (1L, "low low low lower lower newest newest newest newest"),
    (2L, "newest newest widest widest low lowest"),
    (3L, "new new new wider wider lower widest"))
    .toDF("doc_id", "text")

  private val hist = Map(
    "low" -> 4L, "lower" -> 3L, "newest" -> 6L, "widest" -> 3L,
    "lowest" -> 1L, "new" -> 3L, "wider" -> 2L)

  test("learnBpeMerges matches the reference implementation exactly") {
    val got = Vocab.learnBpeMerges(corpus, 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = refBpe(hist, 8, minPairCount = 2L)
    assert(want.length == 8 && got == want)
  }

  test("learnBpeMerges stops early at the minPairCount floor") {
    val got = Vocab.learnBpeMerges(corpus, 100, minPairCount = 5L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == refBpe(hist, 100, minPairCount = 5L) && got.nonEmpty)
    assert(got.forall(_._4 >= 5L))
  }

  test("learnBpeMerges: driver fast path ≡ distributed loop (ties, non-ASCII)") {
    // Engineered ties (equal pair counts) force the (count desc, left,
    // right) tie-break, and the non-BMP char (U+10348, a surrogate pair
    // in UTF-16) makes Java String order diverge from the UTF-8 byte
    // order Spark compares — the fast path must match the loop on both.
    val tricky = Seq(
      (1L, "ab ab cd cd 𐍈z 𐍈z zz zz"),
      (2L, "ab cd 𐍈z zz éé éé ss ss")).toDF("doc_id", "text")
    for (k <- Seq(3, 10)) {
      val fast = Vocab.learnBpeMerges(tricky, k).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val loop = Vocab.learnBpeMerges(tricky, k, driverVocabLimit = 0L).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(fast == loop, s"k=$k")
    }
    // And on the main corpus, where the reference already certifies the
    // fast path: the distributed loop must agree too.
    val fast8 = Vocab.learnBpeMerges(corpus, 8).collect().toSeq
    val loop8 = Vocab.learnBpeMerges(corpus, 8, driverVocabLimit = 0L)
      .collect().toSeq
    assert(fast8 == loop8)
  }

  test("bpeTokenCounts is total: empty and whitespace-only docs emit (0, 0)") {
    val docs = Seq((1L, "low lower"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Vocab.bpeTokenCounts(docs, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 8L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("bpeTokenCounts: zero merges = chars, full merges compress, bounds hold") {
    val merges = Vocab.learnedMerges(Vocab.learnBpeMerges(corpus, 8))
    assert(merges.length == 8)
    val none = Vocab.bpeTokenCounts(corpus, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // With no merges every word is its characters.
    val charCounts = corpus.as[(Long, String)].collect().map { case (id, t) =>
      val ws = t.trim.split("\\s+")
      (id, ws.length.toLong, ws.map(_.length.toLong).sum)
    }.toSeq
    assert(none == charCounts)
    val full = Vocab.bpeTokenCounts(corpus, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // Same word totals; token totals strictly between words and chars.
    assert(full.map(x => (x._1, x._2)) == none.map(x => (x._1, x._2)))
    for (((id, nw, nb), (_, _, nc)) <- full.zip(none)) {
      assert(nb >= nw && nb < nc, s"doc $id: $nw words, $nb bpe, $nc chars")
    }
    // Spot-check a segmentation end-to-end: "newest" under the learned
    // merges must collapse to however many tokens greedy application
    // of the rank-ordered list yields in the reference apply rule.
    val refApply = merges.foldLeft("newest".split("").toList) {
      case (t, (l, r)) =>
        def go(x: List[String]): List[String] = x match {
          case a :: b :: rest if a == l && b == r => (l + r) :: go(rest)
          case a :: rest => a :: go(rest)
          case Nil => Nil
        }
        go(t)
    }
    val opApply = Vocab.bpeTokenCounts(
      Seq((9L, "newest")).toDF("doc_id", "text"), merges).head()
    assert(opApply.getLong(2) == refApply.length.toLong)
  }
}
