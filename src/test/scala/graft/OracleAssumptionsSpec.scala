package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.sources.Tables

/** The generated DuckDB oracles (`graft/oracle/` + the inline entries in
  * `SparkEntry.oracleSql`) reproduce engine semantics under a few
  * corpus-shape assumptions. This spec pins each assumption against the
  * ACTUAL testdata so that a driver-side regeneration that breaks one
  * fails HERE with the oracle named — not as a pile of anonymous hash
  * mismatches in the correctness run (the round-8 events-schema drift,
  * but for oracles). Scope: sf0.001 — the same generators run at every
  * verify scale, and sf0.01 shares the generator.
  */
class OracleAssumptionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // Cheap shape assumptions hold at EVERY testdata scale present; the
  // expensive semantic pins below run at sf0.001 only.
  private val allDirs = Seq("0.001", "0.01", "0.1")
    .map(sf => s"/root/testdata/sf$sf")
    .filter(d => new java.io.File(d).exists())

  test("documents.text is pure ASCII at every scale (Xxh64Sql/BpeSql byte = ord(char))") {
    // ord(substr(t,i,1)) equals the UTF-8 byte only for ASCII; a
    // non-ASCII corpus breaks every xxhash-derived oracle (simhash_docs,
    // doc_fingerprints, doc_winnow, span_dedup) and BpeSql's char split.
    allDirs.foreach { d =>
      val nonAscii = Tables.load(spark, d, "documents")
        .filter(length(col("text")) =!=
          octet_length(col("text").cast("binary")))
        .count()
      assert(nonAscii == 0L,
        s"$d: $nonAscii non-ASCII documents — Xxh64Sql/BpeSql oracles need a byte-level accessor")
    }
  }

  test("vec_id is unique at every scale (quantizer sample tie-break is a total order)") {
    // KmeansSql/PqSql now refit on the engine's bounded sample — the
    // `cap` rows with the smallest (xxhash64(vec_id), vec_id) — so the
    // oracles hold at ANY corpus size (the former n ≤ 2048
    // whole-corpus-fit canary is retired; tools/OracleFixture +
    // selfcheck.py replays the DuckDB comparison at 5000 > 4096
    // vectors). The remaining assumption is that (hash, vec_id) is a
    // TOTAL order, i.e. vec_id never repeats — a duplicate id would
    // make the limit-cap sample boundary engine-arbitrary.
    allDirs.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val dupIds = emb.groupBy("vec_id").count()
        .filter(col("count") > 1).count()
      assert(dupIds == 0L,
        s"$d: $dupIds duplicate vec_ids — the quantizer sample ordering is no longer total")
    }
  }

  test("scaled SemDeDup cell count resolves to the oracles' inlined k=8 at every scale") {
    // semantic_dedup(_multi) derive k from the corpus count
    // (Similarity.scaledCellCount — √N-bounded cell population); the
    // KmeansSql oracle refits with a hard-inlined k = 8. The two agree
    // only while the formula resolves to 8 — a testdata regeneration
    // that crosses 256·8² = 16384 vectors must regenerate the oracle
    // with the new k (and respect the sample-cap canary above).
    allDirs.foreach { d =>
      val n = Tables.load(spark, d, "embeddings").count()
      val k = graft.ext.Similarity.scaledCellCount(n)
      assert(k == 8,
        s"$d: scaledCellCount($n) = $k ≠ 8 — regenerate KmeansSql.semanticDedupSql with k = $k")
    }
  }

  test("embeddings are 64-dimensional at every scale (inlined plane/centroid literals)") {
    allDirs.foreach { d =>
      val dims = Tables.load(spark, d, "embeddings")
        .select(size(col("embedding")).as("d")).distinct().collect()
        .map(_.getInt(0))
      assert(dims.toSeq == Seq(64),
        s"$d: dims ${dims.mkString(",")} — regenerate the 64-dim constants in the ANN/k-means/PQ oracles")
    }
  }

  test("BPE learns 16 full merges, no early stop (BpeSql unrolls exactly 16 rounds)") {
    val merges = graft.ext.Vocab.learnBpeMerges(
      Tables.load(spark, dir, "documents"), 16).collect()
    assert(merges.length == 16,
      s"only ${merges.length} merges before the min-pair-count floor — BpeSql needs a stop-flag chain")
    assert(merges.forall(_.getLong(3) >= 2L))
  }

  test("LSH banding recall is 1.0 at the oracle thresholds on this corpus") {
    // ngram_jaccard_pairs' oracle enumerates ALL exact-Jaccard pairs
    // ≥ 0.3; the engine emits LSH candidates only. A planted near-dup
    // that banding misses would mismatch the oracle — so pin that every
    // all-pairs exact match IS a candidate, and that the est- and
    // exact-thresholded sets coincide at minhash_pairs' 0.5 cutoff.
    val docs = Tables.load(spark, dir, "documents")
    val sets = Dedup.hashedShingles(docs, 3)
      .groupBy("doc_id").agg(collect_set(col("h")).as("s"))
    val allPairs = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (graft.functions.SetFunctions.set_overlap(col("a.s"), col("b.s"))
          .cast("double") /
          (size(col("a.s")) + size(col("b.s")) -
            graft.functions.SetFunctions.set_overlap(col("a.s"), col("b.s"))))
          .as("j"))
    val exact03 = allPairs.filter(col("j") >= 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact05 = allPairs.filter(col("j") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshVerified = Dedup.lshVerifiedJaccardPairs(docs)
      .filter(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val estPairs = Dedup.minhashNearDupPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshVerified == exact03,
      s"banding lost ${(exact03 -- lshVerified).size} true pairs at J≥0.3 — ngram_jaccard_pairs oracle over-counts")
    assert(estPairs == exact05,
      s"estimate-thresholded set differs from exact at 0.5 (${(estPairs diff exact05).size}/${(exact05 diff estPairs).size}) — minhash_pairs oracle diverges")
    // minhash_novel's oracle anti-joins ALL exact cross pairs ≥ 0.5
    // (new ≥ 450 × corpus < 450); the engine screens banding candidates
    // only — pin that banding loses no true CROSS pair, i.e. the
    // screened id set equals the exact anti-join.
    val dupFromExact = exact05.collect {
      case (a, b) if a < 450 && b >= 450 => b
      case (a, b) if b < 450 && a >= 450 => a
    }
    val newIds = docs.filter(col("doc_id") >= 450)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val novelExpected = (newIds -- dupFromExact).toSeq.sorted
    val novelEngine = Dedup.minhashNovel(
        docs.filter(col("doc_id") >= 450), docs.filter(col("doc_id") < 450))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(novelEngine == novelExpected,
      s"cross-slice banding recall broke: engine ${novelEngine.size} novel " +
        s"vs exact ${novelExpected.size} — minhash_novel oracle diverges")
  }

  test("sketch tolerance flags hold corpus-wide (exact-twin oracles emit literal TRUE)") {
    // Each flag is computed by the ENGINE and matched against TRUE in
    // the oracle; a corpus where a sketch drifts past its bound fails
    // the hash compare. Surface it here with the query named.
    def allTrue(q: String, flags: String*): Unit = {
      val df = SparkEntry.queries(q)(spark, dir)
      flags.foreach { f =>
        val bad = df.filter(!col(f)).count()
        assert(bad == 0L, s"$q: $f false on $bad rows — retune the bound in query AND oracle")
      }
    }
    allTrue("hll_vocab_rollup", "est_err_le_2pct")
    allTrue("approx_distinct", "users_err_le_15pct", "events_err_le_3pct")
    allTrue("approx_percentiles", "p50_in_band", "p99_in_band")
    allTrue("rolling_distinct_hll", "est_err_le_5pct")
    allTrue("minhash_pairs", "est_within_02")
  }

  test("no oracle ships an uncast integer SUM as an output column (DuckDB promotes SUM(BIGINT) to HUGEINT)") {
    // The round-9 red query as a standing rule: DuckDB's SUM over
    // integer input yields HUGEINT (→ float64 through pandas), which
    // typed-hash-mismatches Spark's int64 even when every value is
    // identical (bpe_merges: `c AS pair_count` where c = SUM(cnt)).
    // Convict a SUM only when its value can actually surface as an
    // integral OUTPUT column: uncast at the site (no CAST(...) wrapper,
    // no `::type` on the close) AND its alias either IS an output
    // column of the Spark query or is later re-projected bare under an
    // output column's name. Aliasless SUMs are skipped — a bare
    // `SELECT SUM(x)` output column is a loud schema mismatch, not the
    // silent typed-hash class this pins.
    def balancedClose(s: String, open: Int): Int = {
      var depth = 0
      var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val sumRe = "(?i)\\bsum\\s*\\(".r
    val aliasRe = "(?i)^AS\\s+(\"[^\"]+\"|\\w+)".r
    // (query, alias, candidate output-column names) for every
    // uncast-at-site SUM alias, including window SUMs (promotion
    // applies to `SUM(int) OVER (...)` too).
    val candidates = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val open = sql.indexOf('(', m.start)
        val close = balancedClose(sql, open)
        val beforeTrim = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace).reverse
        val castWrapped = beforeTrim.toUpperCase.endsWith("CAST(")
        var after = sql.substring(close + 1).dropWhile(_.isWhitespace)
        var afterPos = close + 1 + (sql.substring(close + 1).length - sql.substring(close + 1).dropWhile(_.isWhitespace).length)
        if (after.take(4).equalsIgnoreCase("OVER")) {
          val overOpen = afterPos + after.indexOf('(')
          val overClose = balancedClose(sql, overOpen)
          after = sql.substring(overClose + 1).dropWhile(_.isWhitespace)
          afterPos = overClose + 1
        }
        val siteCast = after.startsWith("::")
        if (castWrapped || siteCast) None
        else aliasRe.findFirstMatchIn(after).map { am =>
          val alias = am.group(1).stripPrefix("\"").stripSuffix("\"")
          // names the alias could surface under: itself, plus any bare
          // re-projection target `alias AS out` after the binding site
          val rest = sql.substring(afterPos + am.end(0))
          val reprojRe = ("(?i)\\b" + java.util.regex.Pattern.quote(alias) +
            "\\s+AS\\s+(\"[^\"]+\"|\\w+)").r
          val targets = alias +: reprojRe.findAllMatchIn(rest)
            .map(_.group(1).stripPrefix("\"").stripSuffix("\"")).toSeq
          (name, alias, targets.distinct)
        }
      }
    }
    // Resolve output schemas lazily, only for queries with candidates.
    val integralOut = scala.collection.mutable.Map.empty[String, Set[String]]
    def integralCols(q: String): Set[String] = integralOut.getOrElseUpdate(q, {
      SparkEntry.queries(q)(spark, dir).schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.IntegerType ||
          f.dataType == org.apache.spark.sql.types.ShortType => f.name
      }.toSet
    })
    // Shadow rule: if the SQL ALSO binds the same name through a cast
    // (`...::TYPE AS name` or `CAST(... AS TYPE) AS name`), the final
    // projection is the cast one and the same-named internal alias
    // never surfaces (bpe_encode's `COALESCE(a.n_words, 0)::BIGINT AS
    // n_words`, sessionize_batch's `CAST(session_id AS BIGINT) AS
    // session_id`).
    def castBound(sql: String, t: String): Boolean = {
      val qt = java.util.regex.Pattern.quote(t)
      ("(?i)(::\\w+(\\(\\d+(,\\d+)?\\))?|AS\\s+\\w+(\\(\\d+(,\\d+)?\\))?\\))\\s+AS\\s+\"?" + qt + "\"?\\b").r
        .findFirstIn(sql).isDefined
    }
    val offenders = candidates.flatMap { case (q, alias, targets) =>
      val sql = SparkEntry.oracleSql(q)
      val hit = targets.filter(t => integralCols(q).contains(t) && !castBound(sql, t))
      if (hit.nonEmpty)
        Some(s"$q: uncast SUM alias '$alias' surfaces as integral output column " +
          s"'${hit.mkString(",")}' — add ::BIGINT")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("qualifying cross pairs sit above the LSH recall knee (minhash_novel / contamination_neardup oracles)") {
    // These oracles certify the engine's 32-hash/8-band LSH screen
    // against EXHAUSTIVE exact Jaccard, and that certification is
    // fixture-dependent: a cross pair at J barely over the 0.5
    // threshold has a-priori band-miss probability (1−J⁴)⁸ — ≈ 0.56 at
    // J = 0.51 — so a regenerated corpus with knee pairs could
    // false-negative against the oracle even with a correct engine.
    // Pin the assumption by name: every cross-split pair that QUALIFIES
    // (exact J ≥ 0.5) sits at J ≥ 0.8, where the per-pair miss rate is
    // ≤ 1.6e-2 and the deterministic oracle gate has already proven the
    // actual hashes caught them. Non-vacuity: each split must plant at
    // least one qualifying pair, or the oracle certifies nothing.
    // Gram extraction uses the PRODUCTION sliding-window convention
    // (Dedup.hashedShingles / TextAnalysis.scrubCommonSpans: n−2 grams
    // for 3-grams over n tokens, none under 3 tokens) — a sequence()
    // re-derivation here once dropped each doc's last 3-gram, so the
    // measured J was not the J the oracles certify and a true knee
    // pair could read ≥ 0.8 and silently pass.
    val docs = Tables.load(spark, dir, "documents")
    val grams = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(slice(toks, 1, greatest(size(toks) - 2, 0)),
          |  (x, ix) -> concat_ws(' ', slice(toks, ix + 1, 3)))"""
          .stripMargin)).as("g"))
      .distinct()
    val sz = grams.groupBy("doc_id").count()
    val pairs = grams.as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ov"))
      .join(sz.select(col("doc_id").as("da"), col("count").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("count").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("ov") / (col("na") + col("nb") - col("ov"))).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    Seq(("contamination_neardup eval split", 50L),
        ("minhash_novel corpus split", 450L)).foreach { case (name, cut) =>
      val cross = pairs.filter(p =>
        (p._1 < cut) != (p._2 < cut))
      assert(cross.nonEmpty,
        s"$name: no qualifying cross pair at sf0.001 — the oracle gate is vacuous")
      val knee = cross.filter(_._3 < 0.8)
      assert(knee.isEmpty,
        s"$name: pairs in the LSH recall knee (0.5 ≤ J < 0.8): " +
          knee.map(p => f"(${p._1},${p._2}) J=${p._3}%.3f").mkString(", ") +
          " — banding may false-negative vs the exhaustive oracle")
    }
  }
}
