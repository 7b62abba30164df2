package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Sampling, TextAnalysis}

/** Line-granular curation ([[TextAnalysis.dedupLines]],
  * [[TextAnalysis.filterLines]]) and the deterministic sharded shuffle
  * ([[Sampling.shuffleShards]]) — keep-first semantics, blank-line
  * preservation, row-local rule edges, layout invariance.
  */
class LineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dedup(rows: (Long, String)*) =
    TextAnalysis.dedupLines(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("dedupLines: keep-first corpus-wide, normalized identity, blanks preserved") {
    // doc 1 wins every line it contains (smallest doc_id); its own
    // second copy of "a b" (pos 3) is removed too. doc 2's "X" matches
    // doc 1's " x " through lower(trim(·)) and is removed.
    val out = dedup(
      1L -> "a b\n x \n\na b",
      2L -> "X\nc d")
    assert(out(1L) == ("a b\n x \n", 1L)) // dup copy cut, blank kept in place
    assert(out(2L) == ("c d", 1L))
  }

  test("dedupLines: a doc losing every line keeps an empty clean_text row") {
    val out = dedup(
      1L -> "a b\nc d",
      2L -> "c d\na b")
    assert(out(1L) == ("a b\nc d", 0L))
    assert(out(2L) == ("", 2L))
  }

  test("dedupLines: blank-only lines never participate and never dedup each other") {
    val out = dedup(
      1L -> " \n\t\n ",
      2L -> "  ")
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
  }

  test("dedupLines: result is invariant to input partitioning") {
    val docs = (0L until 60L)
      .map(i => (i, s"line ${i % 7}\nline ${i % 3}\nuniq $i"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.dedupLines(docs.repartition(1)).collect().toSeq
    val b = TextAnalysis.dedupLines(docs.repartition(7)).collect().toSeq
    assert(a == b)
    // Exactly one winner per distinct normalized line survives.
    val keptLines = a.flatMap(_.getString(1).split("\n"))
      .map(_.trim.toLowerCase).filter(_.nonEmpty)
    assert(keptLines.distinct.size == keptLines.size)
  }

  test("lineRepetitionStats: Gopher dup-line and dup-char fractions with gate") {
    // doc 1: lines (normalized) = [boiler plate, x, boiler plate,
    // boiler plate, y] → n=5, dups = 2 copies of "boiler plate"
    // (len 12) → dup_line_frac = 2/5 = 0.4,
    // dup_line_char_frac = 24 / (3*12 + 1 + 1) = 24/38 → gate fails.
    // doc 2: all unique, blanks skipped → 0/0, gate passes.
    // doc 3: empty text → 0 lines, 0.0 fractions, gate passes.
    // doc 4: duplicate only through lower(trim) normalization.
    val out = TextAnalysis.lineRepetitionStats(Seq(
        1L -> "boiler plate\nx\nBoiler Plate\n boiler plate \ny",
        2L -> "a b\n\nc d\n",
        3L -> "",
        4L -> "Hello\n  hello  ")
      .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((5L, 0.4, math.rint(24.0 / 38 * 1e4) / 1e4, false)))
    assert(out(2L) == ((2L, 0.0, 0.0, true)))
    assert(out(3L) == ((0L, 0.0, 0.0, true)))
    assert(out(4L) == ((2L, 0.5, 0.5, false)))
  }

  test("lineRepetitionStats: boundary — exactly at the Gopher thresholds passes") {
    // 10 lines, 3 dup copies → dup_line_frac 0.3 exactly; char frac
    // under 0.2 by making the dup line short vs long unique lines.
    val uniq = (1 to 6).map(i => s"unique line number $i padded out well")
    val text = (Seq.fill(4)("dd") ++ uniq).mkString("\n")
    val r = TextAnalysis.lineRepetitionStats(Seq(1L -> text)
      .toDF("doc_id", "text")).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.3)
    assert(r.getBoolean(4), r.toString)
  }

  test("filterLines: word-count, terminal-punctuation, and blocklist rules") {
    val docs = Seq(
      (1L, "This line is long enough.\nshort one\nCall now! FREE offer here\nends without period yet has five words"),
      (2L, "ok\n\nAnother proper sentence right here.")).toDF("doc_id", "text")
    val out = TextAnalysis.filterLines(docs, minWords = 3,
        requireTerminal = true, blocklist = Seq("free OFFER"))
      .collect().map(r =>
        r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: only the first line has ≥3 words AND terminal punctuation
    // AND no blocklisted phrase (case-insensitive both sides).
    assert(out(1L) == (("This line is long enough.", 1L, 3L)))
    // doc 2: blank line and the 1-word line drop.
    assert(out(2L) == (("Another proper sentence right here.", 1L, 2L)))
  }

  test("filterLines: defaults keep everything with ≥ minWords words") {
    val docs = Seq((1L, "one two three\none two")).toDF("doc_id", "text")
    val out = TextAnalysis.filterLines(docs, minWords = 3).collect().head
    assert(out.getString(1) == "one two three")
    assert(out.getLong(2) == 1L && out.getLong(3) == 1L)
  }

  test("shuffleShards: one fixed permutation, invariant to input layout") {
    val df = (0L until 500L).toDF("doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(d, col("doc_id"), numShards = 8, seed = "s")
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val a = run(df.repartition(1))
    val b = run(df.repartition(13))
    assert(a == b)
    // Every shard in range; positions contiguous 1..n within each shard.
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    }
    // A different seed draws a different permutation (overwhelmingly).
    val c = Sampling.shuffleShards(df, col("doc_id"), 8, seed = "t")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(a != c)
  }

  test("dedupLinesAgainstIndex equals dedupLines over the union, restricted to the batch") {
    val corpus = (0L until 30L)
      .map(i => (i, s"line ${i % 5}\nuniq corpus $i\n"))
      .toDF("doc_id", "text")
    val batch = (100L until 130L)
      .map(i => (i, s"line ${i % 9}\nuniq batch $i\n\nline ${i % 9}"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("line-idx").toString
    TextAnalysis.buildLineIndex(corpus, tmp)
    val expected = TextAnalysis.dedupLines(corpus.unionAll(batch))
      .filter(col("doc_id") >= 100L).collect().toSeq
    val got = TextAnalysis.dedupLinesAgainstIndex(batch, tmp)
      .collect().toSeq
    assert(got == expected)
    // The merge plan must give identical verdicts.
    val merge = TextAnalysis.dedupLinesAgainstIndex(batch, tmp,
      broadcastBatch = false).collect().toSeq
    assert(merge == expected)
  }

  test("dedupLinesAgainstIndex: cold start (no index data) is plain batch dedup") {
    val batch = Seq((1L, "a b\nc d"), (2L, "a b\nx y")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("line-cold").toString
    val got = TextAnalysis.dedupLinesAgainstIndex(batch, tmp).collect().toSeq
    assert(got == TextAnalysis.dedupLines(batch).collect().toSeq)
  }

  test("line index lifecycle: append grows the screen, replay no-ops, compact preserves") {
    val c1 = Seq((0L, "seed one\nseed two")).toDF("doc_id", "text")
    val c2 = Seq((1L, "grown line here")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("line-life").toString
    TextAnalysis.buildLineIndex(c1, tmp)
    val batch = Seq((9L, "seed one\ngrown line here\nfresh line now"))
      .toDF("doc_id", "text")
    def screen() = TextAnalysis.dedupLinesAgainstIndex(batch, tmp)
      .collect().head.getLong(2)
    assert(screen() == 1L) // only "seed one" held
    TextAnalysis.appendLineIndex(c2, tmp, ingestId = 1L)
    assert(screen() == 2L) // "grown line here" now held too
    // Replayed ingest id overwrites its own partition — same result.
    TextAnalysis.appendLineIndex(c2, tmp, ingestId = 1L)
    assert(screen() == 2L)
    // Compaction folds ingests, screen unchanged; base survives.
    assert(TextAnalysis.compactLineIndex(spark, tmp))
    assert(screen() == 2L)
    val ingests = new java.io.File(s"$tmp/lines").listFiles()
      .filter(_.getName.startsWith("ingest=")).map(_.getName).toSeq
    assert(ingests == Seq("ingest=0"), ingests.toString)
  }

  test("crash-replay window: excluded ingest + hygiene delete keep the screen blind to its own append") {
    // The streaming twin's data-loss shape: a crash between the index
    // append and the checkpoint commit must not let the REPLAYED screen
    // see the batch's own hashes (it would rewrite every doc down to
    // its blank lines). The screen's excludeIngest and the trigger-start
    // dropLineIngest each independently restore the committed view.
    val corpus = Seq((0L, "held line\nbase filler")).toDF("doc_id", "text")
    val batch = Seq((5L, "held line\nnovel alpha\nnovel alpha"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("line-replay").toString
    TextAnalysis.buildLineIndex(corpus, tmp)
    def screen(excl: Option[Long]) =
      TextAnalysis.dedupLinesAgainstIndex(batch, tmp, excludeIngest = excl)
        .collect().toSeq
    val before = screen(None)
    assert(before.head.getLong(2) == 2L) // held + in-batch dup removed
    TextAnalysis.appendLineIndex(batch, tmp, ingestId = 1L) // crashed attempt
    assert(screen(Some(1L)) == before) // the stream's replayed screen
    // Without the exclusion, the batch's own lines read as held — the
    // bug shape the exclusion exists to prevent.
    assert(screen(None).head.getLong(2) == 3L)
    // Trigger-start hygiene restores the committed index outright.
    TextAnalysis.dropLineIngest(spark, tmp, 1L)
    assert(screen(None) == before)
  }

  test("shuffleShards: numShards = 1 is a pure deterministic total order") {
    val df = (0L until 40L).toDF("doc_id")
    val out = Sampling.shuffleShards(df, col("doc_id"), numShards = 1)
      .select("shard", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.forall(_._1 == 0))
    assert(out.map(_._2).sorted.toSeq == (1L to 40L).toSeq)
  }
}
