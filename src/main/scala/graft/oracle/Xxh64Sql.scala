package graft.oracle

/** DuckDB-SQL generator reproducing Spark's XXH64 (seed 42) — the hash
  * family behind [[graft.ext.Dedup.simhash]],
  * [[graft.ext.TextAnalysis.fingerprint]] and
  * [[graft.ext.Dedup.winnowedFingerprints]] — so those three queries get
  * REAL cross-engine oracles instead of rows-only checks.
  *
  * Technique: 64-bit wrapping arithmetic emulated in HUGEINT with the
  * value kept unsigned in [0, 2^64): multiplication via 32-bit limbs
  * (a full 64×64 product overflows HUGEINT), rotation/shift via exact
  * floor division by powers of two, XOR through a sign-adjusted BIGINT
  * round-trip. Each hash stage is emitted as its OWN nested-subquery
  * projection referencing the previous stage as a column — DuckDB
  * evaluates projection columns once per row, whereas lateral aliases
  * are inlined textually and the ~14 chained stages would blow up
  * exponentially (measured: the alias form did not finish on 9 rows;
  * the staged form hashes the corpus in milliseconds).
  *
  * Every branch of XXH64 is covered (≥32-byte stripes with the 4-lane
  * accumulator carried as a list through `list_reduce`, 8-byte rounds,
  * the 4-byte round, tail bytes, avalanche), validated against Spark's
  * `xxhash64` for string and long inputs across all paths. Inputs are
  * assumed ASCII (`ord(substr(..))` = byte value) — true of the
  * driver's documents corpus; a non-ASCII corpus would need a
  * byte-level accessor instead.
  */
object Xxh64Sql {
  private val W = "18446744073709551616::HUGEINT" // 2^64
  private val H63 = "9223372036854775808::HUGEINT" // 2^63
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"
  private val T32 = "4294967296::HUGEINT" // 2^32
  private val Seed = "42::HUGEINT"

  private def addm(xs: String*): String =
    xs.map(x => s"($x)").mkString("((", " + ", s") % $W)")

  /** (a*b) mod 2^64 via 32-bit limbs; a, b unsigned in [0, 2^64). */
  private def mul64(a: String, b: String): String =
    s"((((( ($a) // $T32) * (($b) % $T32) + (($a) % $T32) * (($b) // $T32)) % $T32) * $T32 " +
      s"+ (($a) % $T32) * (($b) % $T32)) % $W)"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(2).pow(64 - r)
    s"(((($x) % $lo::HUGEINT) * ${BigInt(2).pow(r)}::HUGEINT) + (($x) // $lo::HUGEINT))"
  }

  private def shr(x: String, n: Int): String =
    s"(($x) // ${BigInt(2).pow(n)}::HUGEINT)"

  private def s64(u: String): String =
    s"CAST(($u) - CASE WHEN ($u) >= $H63 THEN $W ELSE 0::HUGEINT END AS BIGINT)"

  private def u64(s: String): String =
    s"(CAST(($s) AS HUGEINT) + CASE WHEN ($s) < 0 THEN $W ELSE 0::HUGEINT END)"

  private def xor64(a: String, b: String): String =
    u64(s"xor(${s64(a)}, ${s64(b)})")

  /** Little-endian 64-bit fetch from byte-list `bl` at 1-indexed `j`. */
  private def f64(bl: String, j: String): String =
    (0 until 8).map(k => s"($bl[$j+$k])*${BigInt(256).pow(k)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def f32(bl: String, j: String): String =
    (0 until 4).map(k => s"($bl[$j+$k])*${BigInt(256).pow(k)}::HUGEINT")
      .mkString("(", " + ", ")")

  /** round(0, lane) = rotl31(lane·P2)·P1 */
  private def rnd0(lane: String): String = mul64(rotl(mul64(lane, P2), 31), P1)

  /** round(acc, lane) = rotl31(acc + lane·P2)·P1 */
  private def rndv(acc: String, lane: String): String =
    mul64(rotl(addm(acc, mul64(lane, P2)), 31), P1)

  private def mergeRound(h: String, v: String): String =
    addm(mul64(xor64(h, rnd0(v)), P1), P4)

  private def staged(inner: String, carry: String,
                     stages: Seq[(String, String)]): String = {
    var sql = inner
    var prev = carry
    stages.foreach { case (expr, name) =>
      sql = s"SELECT $prev, $expr AS $name FROM ($sql)"
      prev = s"$prev, $name"
    }
    sql
  }

  /** Byte-list projection for an ASCII string column/expression. */
  def bytesOf(t: String): String =
    s"list_transform(range(1, length($t)+1), i -> ord(substr($t, i, 1))::HUGEINT)"

  /** Wrap `inner` (exposing byte-list col `bl`, BIGINT length col `n`,
    * plus `carryCols`) in the full XXH64 stage pipeline; the unsigned
    * result lands in `outCol`.
    */
  def xxh64Select(inner: String, carryCols: Seq[String], bl: String,
                  n: String, prefix: String, outCol: String): String = {
    val p = prefix
    val init = s"[${addm(Seed, P1, P2)}, ${addm(Seed, P2)}, ($Seed), " +
      s"(($Seed) - $P1 + $W) % $W]"
    val lanes = s"list_transform(range(0, ($n)//32), si -> " +
      s"[${f64(bl, "si*32+1")}, ${f64(bl, "si*32+9")}, ${f64(bl, "si*32+17")}, ${f64(bl, "si*32+25")}])"
    val chunkRnds =
      s"list_transform(range(($n)//32*32 + 1, ($n) - 6, 8), j -> ${rnd0(f64(bl, "j"))})"
    val j4 = s"(($n)//8*8 + 1)"
    val jb = s"(($n)//8*8 + CASE WHEN ($n) % 8 >= 4 THEN 4 ELSE 0 END + 1)"
    val tail = s"list_transform(range($jb, ($n)+1), j -> ($bl)[j])"
    val stages = Seq(
      (s"list_reduce(list_prepend($init, $lanes), (va, ln) -> " +
        s"[${rndv("va[1]", "ln[1]")}, ${rndv("va[2]", "ln[2]")}, ${rndv("va[3]", "ln[3]")}, ${rndv("va[4]", "ln[4]")}])") -> s"${p}_v",
      addm(rotl(s"${p}_v[1]", 1), rotl(s"${p}_v[2]", 7),
        rotl(s"${p}_v[3]", 12), rotl(s"${p}_v[4]", 18)) -> s"${p}_m0") ++
      (1 to 4).map(i =>
        mergeRound(s"${p}_m${i - 1}", s"${p}_v[$i]") -> s"${p}_m$i") ++ Seq(
      s"CASE WHEN ($n) >= 32 THEN ${p}_m4 ELSE ${addm(Seed, P5)} END" -> s"${p}_hb",
      addm(s"${p}_hb", s"($n)::HUGEINT") -> s"${p}_h0",
      (s"list_reduce(list_prepend(${p}_h0, $chunkRnds), (ac, r8) -> " +
        addm(mul64(rotl(xor64("ac", "r8"), 27), P1), P4) + ")") -> s"${p}_h1",
      (s"CASE WHEN ($n) % 8 >= 4 THEN " +
        addm(mul64(rotl(xor64(s"${p}_h1", mul64(f32(bl, j4), P1)), 23), P2), P3) +
        s" ELSE ${p}_h1 END") -> s"${p}_h2",
      (s"list_reduce(list_prepend(${p}_h2, $tail), (ac, bt) -> " +
        mul64(rotl(xor64("ac", mul64("bt", P5)), 11), P1) + ")") -> s"${p}_h3",
      xor64(s"${p}_h3", shr(s"${p}_h3", 33)) -> s"${p}_a1",
      mul64(s"${p}_a1", P2) -> s"${p}_a2",
      xor64(s"${p}_a2", shr(s"${p}_a2", 29)) -> s"${p}_a3",
      mul64(s"${p}_a3", P3) -> s"${p}_a4",
      xor64(s"${p}_a4", shr(s"${p}_a4", 32)) -> outCol)
    staged(inner, (carryCols ++ Seq(bl, n)).mkString(", "), stages)
  }

  /** XXH64.hashLong(lane, seed): the 8-byte single-round path. `lane`
    * is a column; `seedExpr` may be a column or literal. The lane stays
    * carried so the stage that consumes it can see it.
    */
  def hashLongSelect(inner: String, carryCols: Seq[String], laneCol: String,
                     seedExpr: String, prefix: String,
                     outCol: String): String = {
    val p = prefix
    val stages = Seq(
      addm(seedExpr, P5, "8::HUGEINT") -> s"${p}_h0",
      addm(mul64(rotl(xor64(s"${p}_h0", rnd0(laneCol)), 27), P1), P4) -> s"${p}_h1",
      xor64(s"${p}_h1", shr(s"${p}_h1", 33)) -> s"${p}_a1",
      mul64(s"${p}_a1", P2) -> s"${p}_a2",
      xor64(s"${p}_a2", shr(s"${p}_a2", 29)) -> s"${p}_a3",
      mul64(s"${p}_a3", P3) -> s"${p}_a4",
      xor64(s"${p}_a4", shr(s"${p}_a4", 32)) -> outCol)
    staged(inner, (carryCols :+ laneCol).mkString(", "), stages)
  }

  /** Spark's `xxhash64(<BIGINT col>)` (seed 42, the 8-byte hashLong
    * path) as a SIGNED BIGINT projection — the ordering key of the
    * engine's bounded deterministic training sample
    * ([[graft.ext.Similarity.trainSample]]: the `cap` rows with the
    * smallest (xxhash64(id), id)). Wraps `inner` (exposing `idCol` +
    * `carryCols`); consumers `ORDER BY outCol, idCol LIMIT cap` to
    * refit on EXACTLY the engine's sample at any corpus size.
    */
  def hashLongOf(inner: String, carryCols: Seq[String], idCol: String,
                 prefix: String, outCol: String): String = {
    val keep = (carryCols :+ idCol).mkString(", ")
    val withLane = s"SELECT $keep, ${u64(idCol)} AS ${prefix}_lane " +
      s"FROM ($inner)"
    val hashed = hashLongSelect(withLane, carryCols :+ idCol,
      s"${prefix}_lane", Seed, prefix, s"${prefix}_u")
    s"SELECT $keep, ${s64(s"${prefix}_u")} AS $outCol FROM ($hashed)"
  }

  /** `simhash_docs`' relation without the presentation sort (shared
    * with the pairs oracle): per-token xxh64, 64 per-bit votes, bit
    * set when the vote is strictly positive (the engine's rule).
    */
  private def simhashCore: String = {
    val inner = "SELECT doc_id, " + bytesOf("tok") +
      " AS bl, length(tok) AS n FROM (SELECT doc_id, " +
      raw"unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)"
    val hashed = xxh64Select(inner, Seq("doc_id"), "bl", "n", "x", "x_u")
    val votes = (0 until 64).map(b =>
      s"sum(CASE WHEN (x_u // ${BigInt(2).pow(b)}::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val bits = (0 until 64).map(b =>
      s"(CASE WHEN v$b > 0 THEN ${BigInt(2).pow(b)}::HUGEINT ELSE 0::HUGEINT END)")
      .mkString(" + ")
    s"SELECT doc_id, ${s64("sh_u")} AS simhash FROM (" +
      s"SELECT doc_id, ($bits) AS sh_u FROM (" +
      s"SELECT doc_id, $votes FROM ($hashed) GROUP BY doc_id))"
  }

  /** Oracle for `simhash_docs`. */
  def simhashSql: String = simhashCore + " ORDER BY doc_id"

  /** Oracle for `simhash_pairs`: EXHAUSTIVE all-pairs Hamming over the
    * re-derived simhash. The engine enumerates banded candidates only,
    * but its 4×16-bit banding is COMPLETE at Hamming ≤ 3 (pigeonhole:
    * 3 differing bits cannot touch all four bands), so a hash match
    * against the exhaustive set certifies both the fingerprint AND
    * that banding lost nothing.
    */
  def simhashPairsSql(maxHamming: Int = 3): String =
    s"""WITH sh AS ($simhashCore)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY 1, 2""".stripMargin

  /** Oracle for `simhash_novel` / `simhash_novel_r5`
    * ([[graft.ext.Dedup.simhashNovelAgainstIndex]]): exhaustive
    * batch-vs-corpus Hamming over the re-derived simhash, keeping each
    * batch doc's best (smallest-distance, ties to the smallest corpus
    * id) match within `maxHamming`, or null + is_novel. The engine
    * probes banded candidates only — complete through radius 3 plain
    * and radius 7 via the single-bit-expanded multi-index form — so
    * equality against the exhaustive verdict certifies the persisted
    * probe (including the broadcast plan's semi-join prune) end to end.
    */
  def simhashNovelSql(maxHamming: Int = 3, split: Long = 450L): String =
    s"""WITH sh AS ($simhashCore),
       |bsh AS (SELECT * FROM sh WHERE doc_id >= $split),
       |csh AS (SELECT * FROM sh WHERE doc_id < $split),
       |scored AS (SELECT b.doc_id,
       |    CAST(bit_count(xor(b.simhash, c.simhash)) AS INTEGER)
       |      AS hamming,
       |    c.doc_id AS corpus_id
       |  FROM bsh b JOIN csh c
       |    ON bit_count(xor(b.simhash, c.simhash)) <= $maxHamming),
       |best AS (SELECT doc_id, hamming AS best_hamming,
       |    corpus_id AS match_id
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY hamming ASC, corpus_id ASC) AS rn
       |        FROM scored) WHERE rn = 1)
       |SELECT n.doc_id, best_hamming IS NULL AS is_novel,
       |  best_hamming, match_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $split) n
       |LEFT JOIN best USING (doc_id) ORDER BY n.doc_id""".stripMargin

  /** Oracle for `doc_fingerprints`: xxh64 of the whole normalized text
    * (lower, whitespace-collapsed) — exercises the ≥32-byte stripe path.
    */
  def fingerprintSql: String = {
    val inner = "SELECT doc_id, " + bytesOf("nt") +
      " AS bl, length(nt) AS n FROM (SELECT doc_id, " +
      raw"array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ') AS nt FROM documents)"
    val hashed = xxh64Select(inner, Seq("doc_id"), "bl", "n", "x", "x_u")
    s"SELECT doc_id, ${s64("x_u")} AS fingerprint FROM ($hashed) ORDER BY doc_id"
  }

  /** Oracle for `span_dedup`: the greedy one-pass repeated-span scrub
    * ([[graft.ext.TextAnalysis.dropRepeatedSpans]], n=3). The gram at
    * position i is the wrapping chain h = 42; h = h·31 + hash(tok_j)
    * for j = i+2 down to i (token hashes via the xxh64 pipeline). The
    * sequential skip-by-3 scan with its growing seen-set is a
    * RECURSIVE CTE stepping one token position per round across all
    * docs simultaneously (a `list_reduce` fold over a struct state
    * measured pathologically slow in DuckDB 1.0; the recursion is
    * ~max-tokens rounds of an indexed join). Docs under 3 tokens pass
    * through as trimmed text, like the engine.
    */
  def spanDedupSql: String = {
    val inner = "SELECT doc_id, pos, " + bytesOf("tok") +
      " AS bl, length(tok) AS n, tok FROM (SELECT doc_id, " +
      raw"unnest(string_split_regex(trim(text), '\s+')) AS tok, " +
      raw"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos FROM documents)"
    val th = xxh64Select(inner, Seq("doc_id", "pos", "tok"), "bl", "n", "x",
      "th")
    val g1 = addm(mul64("42::HUGEINT", "31::HUGEINT"), "t2")
    val g2 = addm(mul64(s"($g1)", "31::HUGEINT"), "t1")
    val g3 = addm(mul64(s"($g2)", "31::HUGEINT"), "t0")
    s"""WITH RECURSIVE g_t AS MATERIALIZED (
       |  SELECT doc_id, pos, tok, CASE WHEN t2 IS NOT NULL THEN ($g3) ELSE NULL END AS g
       |  FROM (SELECT doc_id, pos, tok, th AS t0, lead(th,1) OVER w AS t1, lead(th,2) OVER w AS t2
       |        FROM ($th) WINDOW w AS (PARTITION BY doc_id ORDER BY pos))),
       |nt AS (SELECT doc_id, count(*) AS ntok FROM g_t GROUP BY doc_id),
       |step(doc_id, i, seen, outp, dropped) AS (
       |  SELECT doc_id, 1::BIGINT, []::HUGEINT[], []::VARCHAR[], 0::BIGINT FROM nt WHERE ntok >= 3
       |  UNION ALL
       |  SELECT s.doc_id,
       |    CASE WHEN g.g IS NOT NULL AND list_contains(s.seen, g.g) THEN s.i + 3 ELSE s.i + 1 END,
       |    CASE WHEN g.g IS NOT NULL AND NOT list_contains(s.seen, g.g) THEN list_append(s.seen, g.g) ELSE s.seen END,
       |    CASE WHEN g.g IS NOT NULL AND list_contains(s.seen, g.g) THEN s.outp ELSE list_append(s.outp, g.tok) END,
       |    s.dropped + CASE WHEN g.g IS NOT NULL AND list_contains(s.seen, g.g) THEN 1 ELSE 0 END
       |  FROM step s JOIN g_t g ON g.doc_id = s.doc_id AND g.pos = s.i),
       |final AS (SELECT doc_id, outp, dropped FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY i DESC) AS rn FROM step) WHERE rn = 1)
       |SELECT d.doc_id,
       |  CASE WHEN f.doc_id IS NULL THEN trim(d.text) ELSE array_to_string(f.outp, ' ') END AS clean_text,
       |  COALESCE(f.dropped, 0) AS spans_dropped
       |FROM documents d LEFT JOIN final f ON f.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Oracle for `doc_winnow`: token hashes → 3-token shingle hashes via
    * the engine's right-to-left hashLong chain → window-4 sliding minima
    * (SIGNED comparison — Scala's Array[Long].min) → distinct per doc.
    */
  def winnowSql: String = winnowSqlFrom("documents")

  /** [[winnowSql]] over an arbitrary (doc_id, text) relation — the
    * composable form the containment-screen and curation-composite
    * oracles build on (their corpora are doc_id slices, not the whole
    * table).
    */
  def winnowSqlFrom(rel: String): String = {
    val inner = "SELECT doc_id, pos, " + bytesOf("tok") +
      " AS bl, length(tok) AS n FROM (SELECT doc_id, " +
      raw"unnest(string_split_regex(trim(text), '\s+')) AS tok, " +
      raw"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos FROM $rel)"
    val th = xxh64Select(inner, Seq("doc_id", "pos"), "bl", "n", "x", "th")
    val sh0 = s"SELECT doc_id, pos, th AS t0, lead(th,1) OVER w AS t1, " +
      s"lead(th,2) OVER w AS t2 FROM ($th) " +
      "WINDOW w AS (PARTITION BY doc_id ORDER BY pos)"
    val sh1 = s"SELECT * FROM ($sh0) WHERE t2 IS NOT NULL"
    val c1 = hashLongSelect(sh1, Seq("doc_id", "pos", "t0", "t1"), "t2",
      Seed, "q1", "hl1")
    val c2 = hashLongSelect(c1, Seq("doc_id", "pos", "t0"), "t1", "hl1",
      "q2", "hl2")
    val c3 = hashLongSelect(c2, Seq("doc_id", "pos"), "t0", "hl2", "q3",
      "sh_u")
    val sgn = s"SELECT doc_id, pos, ${s64("sh_u")} AS sh_s FROM ($c3)"
    val win = s"SELECT doc_id, pos, sh_s, count(*) OVER (PARTITION BY doc_id) AS c, " +
      "row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn, " +
      "min(sh_s) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin " +
      s"FROM ($sgn)"
    "SELECT DISTINCT doc_id, fp AS fingerprint FROM (" +
      "SELECT doc_id, CASE WHEN c < 4 THEN sh_s ELSE wmin END AS fp " +
      s"FROM ($win) WHERE c < 4 OR rn <= c - 3) " +
      "ORDER BY doc_id, fingerprint"
  }

  /** Oracle for `containment_pairs`: exhaustive asymmetric containment
    * over the re-derived winnow fingerprints ([[winnowSql]]'s relation)
    * — shared-fingerprint counts per pair against each side's FULL
    * fingerprint-set size. The engine joins only docs sharing a
    * fingerprint, which is complete for threshold > 0, so equality
    * against the exhaustive form certifies both the fingerprints and
    * that the inverted join lost nothing.
    */
  def containmentPairsSql(threshold: Double = 0.5,
                          rel: String = "documents"): String =
    s"""WITH fp AS (SELECT doc_id, fingerprint FROM (${winnowSqlFrom(rel)})),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY 1),
       |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |       FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT sh.doc_a, sh.doc_b, sh.shared,
       |  ROUND(CAST(sh.shared AS DOUBLE) / na.n, 4) AS a_in_b,
       |  ROUND(CAST(sh.shared AS DOUBLE) / nb.n, 4) AS b_in_a
       |FROM sh JOIN sz na ON na.doc_id = sh.doc_a
       |        JOIN sz nb ON nb.doc_id = sh.doc_b
       |WHERE GREATEST(ROUND(CAST(sh.shared AS DOUBLE) / na.n, 4),
       |               ROUND(CAST(sh.shared AS DOUBLE) / nb.n, 4)) >= $threshold
       |ORDER BY 1, 2""".stripMargin

  /** Oracle for `containment_novel`
    * ([[graft.ext.Dedup.containmentAgainstIndex]]): exhaustive
    * one-sided containment of every batch doc (doc_id >= `split`) in
    * every standing-corpus doc (doc_id < `split`) over the re-derived
    * winnow fingerprints; the verdict keeps the best (rounded score,
    * corpus id) match at-or-above `threshold`, or null + is_novel. The
    * engine joins only docs sharing a fingerprint — complete for
    * threshold > 0 — so equality against the exhaustive form certifies
    * the persisted-index probe end to end.
    */
  def containmentNovelSql(threshold: Double = 0.5,
                          split: Long = 450L): String =
    s"""WITH fp AS (SELECT doc_id, fingerprint FROM (${winnowSql})),
       |bfp AS (SELECT * FROM fp WHERE doc_id >= $split),
       |cfp AS (SELECT * FROM fp WHERE doc_id < $split),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM bfp GROUP BY 1),
       |cand AS (SELECT b.doc_id, c.doc_id AS corpus_id, COUNT(*) AS shared
       |         FROM bfp b JOIN cfp c ON b.fingerprint = c.fingerprint
       |         GROUP BY 1, 2),
       |scored AS (SELECT cand.doc_id,
       |             ROUND(CAST(shared AS DOUBLE) / sz.n, 4) AS cont,
       |             corpus_id
       |           FROM cand JOIN sz USING (doc_id)
       |           WHERE ROUND(CAST(shared AS DOUBLE) / sz.n, 4) >= $threshold),
       |best AS (SELECT doc_id, cont AS best_containment,
       |           corpus_id AS match_id
       |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |                 ORDER BY cont DESC, corpus_id DESC) AS rn
       |               FROM scored) WHERE rn = 1)
       |SELECT n.doc_id, best_containment IS NULL AS is_novel,
       |  best_containment, match_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $split) n
       |LEFT JOIN best USING (doc_id) ORDER BY n.doc_id""".stripMargin

  /** Oracle for `dsir_weights`
    * ([[graft.ext.TextAnalysis.dsirWeights]]): unlike the
    * `bigram_logprob*` oracles (which may use word STRINGS because
    * their models are collision-free), the DSIR model IS the bucketed
    * histogram — `pmod(hash, buckets)` collisions are semantic — so
    * the oracle reproduces the engine's exact xxh64 chain (token hash
    * → `hashLong` gram chain, the [[winnowSql]] pipeline) before the
    * mod. Unsigned `% 2^b` equals Spark's signed `pmod` because
    * 2⁶⁴ ≡ 0 (mod 2^b); `buckets` must be a power of two. Smoothed
    * log-ratios truncate through DECIMAL(27,12) pre-sum, the
    * established fold-order discipline.
    */
  def dsirWeightsSql(buckets: Int = 1024, split: Long = 250L): String = {
    s"""WITH feats AS (${dsirFeatsSql("documents", buckets)}),
       |tfe AS (SELECT * FROM feats WHERE doc_id < $split),
       |sfe AS (SELECT * FROM feats WHERE doc_id >= $split),
       |${dsirScoreCtes(buckets)}
       |$dsirScoreSelect""".stripMargin
  }

  /** The hashed unigram+bigram feature stream of a (doc_id, text)
    * relation — the composable half of [[dsirWeightsSql]], so the
    * curation-composite oracle can score dynamic corpora (e.g. kept
    * docs) against dynamic targets.
    */
  def dsirFeatsSql(rel: String, buckets: Int = 1024): String = {
    val inner = "SELECT doc_id, pos, " + bytesOf("tok") +
      " AS bl, length(tok) AS n FROM (SELECT doc_id, " +
      raw"unnest(string_split_regex(trim(text), '\s+')) AS tok, " +
      raw"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos FROM $rel)"
    val th = xxh64Select(inner, Seq("doc_id", "pos"), "bl", "n", "x", "th")
    val uni = hashLongSelect(s"SELECT doc_id, pos, th FROM ($th)",
      Seq("doc_id", "pos"), "th", Seed, "u1", "ug")
    val pairs = s"SELECT doc_id, pos, th AS t0, " +
      s"lead(th,1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1 FROM ($th)"
    val b1 = hashLongSelect(s"SELECT * FROM ($pairs) WHERE t1 IS NOT NULL",
      Seq("doc_id", "pos", "t0"), "t1", Seed, "b1", "hl1")
    val b2 = hashLongSelect(b1, Seq("doc_id", "pos"), "t0", "hl1", "b2", "bg")
    s"""SELECT doc_id, ug % $buckets AS f FROM ($uni)
       |  UNION ALL
       |  SELECT doc_id, bg % $buckets AS f FROM ($b2)""".stripMargin
  }

  /** Smoothed log-ratio scoring CTEs over feature relations `tfe`
    * (target) and `sfe` (candidate) — [[dsirWeightsSql]]'s tail,
    * reusable against any pair of feature streams.
    */
  def dsirScoreCtes(buckets: Int = 1024): String =
    s"""tf AS (SELECT f, COUNT(*) AS ct FROM tfe GROUP BY 1),
       |sf AS (SELECT f, COUNT(*) AS cs FROM sfe GROUP BY 1),
       |nt AS (SELECT SUM(ct) AS nt FROM tf),
       |ns AS (SELECT SUM(cs) AS ns FROM sf),
       |ratio AS (SELECT COALESCE(tf.f, sf.f) AS f,
       |  LN((CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + $buckets.0)) -
       |  LN((CAST(COALESCE(cs, 0) AS DOUBLE) + 1.0) / (CAST(ns AS DOUBLE) + $buckets.0)) AS lr
       |  FROM tf FULL OUTER JOIN sf ON tf.f = sf.f CROSS JOIN nt CROSS JOIN ns),
       |scored AS (SELECT doc_id, CAST(lr AS DECIMAL(27,12)) AS lr
       |  FROM sfe JOIN ratio USING (f))""".stripMargin

  /** The per-doc rollup select over [[dsirScoreCtes]]'s `scored`. */
  def dsirScoreSelect: String =
    """SELECT doc_id, COUNT(*) AS n_feats,
      |  ROUND(CAST(SUM(lr) AS DOUBLE), 4) AS sum_log_ratio,
      |  ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 4) AS mean_log_ratio
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
