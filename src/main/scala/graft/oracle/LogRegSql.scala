package graft.oracle

/** DuckDB replay of [[graft.ext.Classifier]]'s ENTIRE training run —
  * not just the scoring pass. The `iters` preconditioned gradient
  * rounds unroll into a CTE chain (`w0 → m1/r1/g1/w1 → … → w_iters`),
  * each stage reproducing the engine's exact arithmetic:
  *
  *   - `feats`: the same xxh64 token-hash → hashLong → pmod bucket
  *     chain as [[Xxh64Sql.dsirWeightsSql]]'s unigram pass (power-of-
  *     two buckets make unsigned `%` equal Spark's signed pmod), plus
  *     the bias row `(k = buckets, c = 1)`;
  *   - `s2`: the exact integer second moment Σc² per bucket — the
  *     Jacobi preconditioner, `CAST(SUM(...) AS BIGINT)` per the
  *     repo's hugeint rule;
  *   - margins `SUM(w·c)` are exact integer dot products; the
  *     algebraic sigmoid `0.5 + m/(2·(1+abs(m)))` and the per-row
  *     `r·(c/s2)` term chain the SAME correctly-rounded double ops in
  *     the SAME order as the Spark expressions, so doubles agree
  *     bit-for-bit;
  *   - gradient terms round to DECIMAL(27,12) before the sum (fold-
  *     order-proof); the summed gradient is provably in (−1,1) (c ≥ 1
  *     ⇒ Σc ≤ Σc²), so it narrows losslessly to DECIMAL(13,12) and
  *     the weight step `ROUND(g · lr·10⁶)` multiplies within decimal
  *     precision bounds — DuckDB's decimal ROUND and BigDecimal
  *     HALF_UP both round half away from zero.
  *
  * `base`/`feats` are MATERIALIZED: the chain references them
  * 2·iters+2 times and re-inlining the xxh64 pipeline each time would
  * blow up the oracle's runtime.
  */
object LogRegSql {

  /** The registered query's label: documents where 'fast' outnumbers
    * 'slow' — exactly linearly separable in count space, so the model
    * must learn the two discriminative dimensions among the hashed
    * buckets. */
  val defaultLabelSql: String =
    raw"CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), t -> t = 'fast')) > " +
    raw"len(list_filter(string_split_regex(trim(text), '\s+'), t -> t = 'slow')) " +
    "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"

  /** Full train-then-score replay of
    * [[graft.ext.Classifier.trainAndScore]] over the `documents` view:
    * `(doc_id, n_tokens, y, p, keep)` ordered by doc_id. */
  def trainScoreSql(buckets: Int = 256, iters: Int = 16,
                    lr: BigDecimal = BigDecimal("0.5"),
                    labelSql: String = defaultLabelSql): String = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val lrStep = (lr * BigDecimal(1000000L)).toBigIntExact
      .getOrElse(sys.error(s"lr * 1e6 must be integral, got $lr"))
    val inner = "SELECT doc_id, pos, " + Xxh64Sql.bytesOf("tok") +
      " AS bl, length(tok) AS n FROM (SELECT doc_id, " +
      raw"unnest(string_split_regex(trim(text), '\s+')) AS tok, " +
      raw"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos FROM documents)"
    val th = Xxh64Sql.xxh64Select(inner, Seq("doc_id", "pos"), "bl", "n",
      "x", "th")
    val uni = Xxh64Sql.hashLongSelect(s"SELECT doc_id, pos, th FROM ($th)",
      Seq("doc_id", "pos"), "th", "42::HUGEINT", "u1", "ug")
    val sigma = (m: String) => s"0.5 + $m / (2.0 * (1.0 + abs($m)))"
    val sb = new StringBuilder
    sb ++= s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
       |    $labelSql AS y
       |  FROM documents),
       |feats AS MATERIALIZED (
       |  SELECT f.doc_id, f.k, f.c, b.n, b.y FROM (
       |    SELECT doc_id, CAST(ug % $buckets AS BIGINT) AS k, COUNT(*) AS c
       |    FROM ($uni) GROUP BY 1, 2
       |    UNION ALL
       |    SELECT doc_id, CAST($buckets AS BIGINT) AS k,
       |      CAST(1 AS BIGINT) AS c FROM base) f
       |  JOIN base b USING (doc_id)),
       |s2 AS MATERIALIZED (
       |  SELECT k, CAST(SUM(c * c) AS BIGINT) AS s2 FROM feats GROUP BY 1),
       |w0 AS (SELECT CAST(range AS BIGINT) AS k, CAST(0 AS BIGINT) AS w
       |  FROM range(${buckets + 1}))""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s""",
       |m$i AS (SELECT doc_id, SUM(w * c) AS s, MIN(y) AS y
       |  FROM feats JOIN w${i - 1} USING (k) GROUP BY doc_id),
       |r$i AS (SELECT doc_id, (${sigma("m")}) - y AS r
       |  FROM (SELECT doc_id, CAST(s AS DOUBLE) / 1000000.0 AS m, y FROM m$i)),
       |g$i AS (SELECT k, CAST(SUM(CAST(r * (CAST(c AS DOUBLE) / CAST(s2 AS DOUBLE)) AS DECIMAL(27,12))) AS DECIMAL(13,12)) AS g
       |  FROM feats JOIN r$i USING (doc_id) JOIN s2 USING (k) GROUP BY k),
       |w$i AS (SELECT p.k, p.w - COALESCE(CAST(ROUND(g.g * $lrStep) AS BIGINT), 0) AS w
       |  FROM w${i - 1} p LEFT JOIN g$i g ON p.k = g.k)""".stripMargin
    }
    sb ++= s""",
       |mf AS (SELECT doc_id, SUM(w * c) AS s, MIN(n) AS n, MIN(y) AS y
       |  FROM feats JOIN w$iters USING (k) GROUP BY doc_id)
       |SELECT doc_id, n AS n_tokens, CAST(y AS BIGINT) AS y,
       |  ROUND(${sigma("m")}, 6) AS p,
       |  (${sigma("m")}) >= 0.5 AS keep
       |FROM (SELECT doc_id, CAST(s AS DOUBLE) / 1000000.0 AS m, n, y FROM mf)
       |ORDER BY doc_id""".stripMargin
    sb.toString
  }
}
