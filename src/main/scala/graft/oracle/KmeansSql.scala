package graft.oracle

import graft.ext.Similarity

/** DuckDB-SQL generator reproducing the engine's spherical k-means fit
  * ([[graft.ext.Similarity.kmeansFit]]) bit-exactly, which upgrades the
  * k-means-backed queries (`kmeans_clusters`, `semantic_dedup`,
  * `semantic_dedup_multi`, `semantic_novel`) from rows-only checks to
  * real cross-engine oracles.
  *
  * Why this is possible at all: every step of the fit is deterministic
  * by design — seeded gaussian init (the exact float constants inline
  * as literals), first-max cell assignment (row_number ties toward the
  * lower index, [[graft.functions.IvfCellAssign]]'s rule), per-cell
  * sums in FIXED-POINT (`Math.round(x·2^24)` per component = SQL
  * `floor(x·2^24 + 0.5)` — Java's half-up, NOT DuckDB `round`'s
  * half-away — summed as exact BIGINTs), and renormalization whose
  * norm folds left-to-right (`list_reduce`, matching Scala's
  * sequential `.sum`) before each component rounds through FLOAT.
  * Iterations unroll as CTE blocks; the fitted centroids are a k-row
  * relation joined by every consumer.
  *
  * Sample scope: [[graft.ext.Similarity.kmeansFit]] trains on the
  * bounded deterministic sample ([[Similarity.trainSample]] — the
  * 256·k rows with the smallest (xxhash64(vec_id), vec_id)) and
  * assigns the FULL corpus once. The oracle reproduces both sides:
  * each refit's `sample` CTE orders by [[Xxh64Sql.hashLongOf]]'s
  * bit-exact hashLong and takes the same cap, while every consumer's
  * assignment scans the `corpus` CTE — so the oracle stays valid past
  * the cap (at or under it, sample ≡ corpus and the SQL degenerates
  * to the former whole-corpus fit).
  */
object KmeansSql {
  private val Scale = "16777216" // 2^24 — VecSumFixed's default scaleBits

  /** Full-corpus relation (float + double embedding forms). */
  private def corpusCte(pred: String = "TRUE"): String =
    "corpus AS (SELECT vec_id, embedding AS emb_f, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d " +
      s"FROM embeddings WHERE $pred)"

  /** The engine's training sample over `corpus`: smallest `cap` rows
    * by (xxhash64(vec_id), vec_id) — [[Similarity.trainSample]]'s
    * total order, reproduced bit-exactly.
    */
  private def sampleCte(cap: Int): String = {
    val hashed = Xxh64Sql.hashLongOf(
      "SELECT vec_id, emb_f, emb_d FROM corpus",
      Seq("emb_f", "emb_d"), "vec_id", "sx", "xh")
    s"sample AS (SELECT vec_id, emb_f, emb_d FROM ($hashed) " +
      s"ORDER BY xh, vec_id LIMIT $cap)"
  }

  /** One fitted-centroid CTE chain over CTE `sample`(vec_id, emb_f,
    * emb_d); the result relation is `{pfx}c{iters}`(cell 1-based,
    * cf FLOAT[]).
    */
  def fitCtes(k: Int, iters: Int, pfx: String = "",
              sample: String = "sample"): String = {
    val rows = Similarity.centroids(k, 64, 7L).zipWithIndex.map {
      case (c, i) =>
        s"(${i + 1}, [${c.map(_.toDouble.toString).mkString(",")}]::FLOAT[])"
    }.mkString(", ")
    val parts = new StringBuilder(s"${pfx}c0(cell, cf) AS (VALUES $rows)")
    for (i <- 1 to iters) {
      parts ++= s""",
${pfx}d$i AS (SELECT v.vec_id, v.emb_f, v.emb_d, c.cell,
        list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
        FROM $sample v CROSS JOIN ${pfx}c${i - 1} c),
${pfx}a$i AS (SELECT vec_id, emb_f, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM ${pfx}d$i) WHERE rn = 1),
${pfx}u$i AS (SELECT cell, unnest(emb_f) AS x, generate_subscripts(emb_f, 1) AS di FROM ${pfx}a$i),
${pfx}s$i AS (SELECT cell, list(sfx ORDER BY di) AS sums FROM (
        SELECT cell, di, SUM(CAST(floor(CAST(x AS DOUBLE)*$Scale + 0.5) AS BIGINT)) AS sfx
        FROM ${pfx}u$i GROUP BY cell, di) GROUP BY cell),
${pfx}n$i AS (SELECT cell, sums,
        sqrt(list_reduce(list_transform(sums, x -> (x/$Scale.0)*(x/$Scale.0)), (a,b) -> a+b)) AS nrm
        FROM ${pfx}s$i),
${pfx}c$i AS (SELECT c.cell,
        CASE WHEN n.cell IS NULL OR n.nrm = 0 THEN c.cf
             ELSE list_transform(n.sums, x -> CAST((x/$Scale.0)/n.nrm AS FLOAT)) END AS cf
        FROM ${pfx}c${i - 1} c LEFT JOIN ${pfx}n$i n ON n.cell = c.cell)"""
    }
    parts.toString
  }

  /** Oracle for `kmeans_clusters` (k=8, iters=4): fit on the 2048-row
    * sample, assignment of the FULL corpus under the fitted centroids,
    * per-cell size and DECIMAL(27,12) mean cosine. Output cell ids are
    * 0-based like IvfCellAssign's.
    */
  def kmeansClustersSql: String =
    s"""WITH ${corpusCte()},
       |${sampleCte(2048)},
       |${fitCtes(8, 4)},
       |final_d AS (SELECT v.vec_id, v.emb_d, c.cell,
       |        list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
       |        FROM corpus v CROSS JOIN c4 c),
       |final_a AS (SELECT vec_id, cell, s, sqrt(list_dot_product(emb_d, emb_d)) AS vn FROM (
       |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM final_d) WHERE rn = 1)
       |SELECT cell - 1 AS cell, count(*) AS n_vecs,
       |       CAST(round(SUM(CAST(s/vn AS DECIMAL(27,12))) / count(*), 4) AS DOUBLE) AS mean_cos
       |FROM final_a GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracles for `semantic_dedup` / `semantic_dedup_multi` (k=8,
    * iters=2, threshold 0.25): within-cell pairs at unrounded cosine ≥
    * threshold, connected components via transitive closure, min-id
    * survivor per group. The multi form adds each vector's 2nd-best
    * cell when its cosine is within 0.1 of the best (the boundary
    * dual-assignment), deduplicating edges met in several shared cells.
    */
  def semanticDedupSql(multi: Boolean): String = {
    val assigned =
      if (!multi)
        """asg AS (SELECT vec_id, emb_d, nrm, cell FROM (
          |    SELECT v.vec_id, v.emb_d, sqrt(list_dot_product(v.emb_d, v.emb_d)) AS nrm, c.cell,
          |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
          |             list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) DESC, c.cell) AS rn
          |    FROM corpus v CROSS JOIN c2 c) WHERE rn = 1)""".stripMargin
      else
        """ranked AS (SELECT v.vec_id, v.emb_d, sqrt(list_dot_product(v.emb_d, v.emb_d)) AS nrm, c.cell,
          |           list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s,
          |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
          |             list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) DESC, c.cell) AS rn
          |    FROM corpus v CROSS JOIN c2 c),
          |best AS (SELECT vec_id, s AS s1 FROM ranked WHERE rn = 1),
          |asg AS (SELECT r.vec_id, r.emb_d, r.nrm, r.cell FROM ranked r JOIN best b ON b.vec_id = r.vec_id
          |        WHERE r.rn = 1 OR (r.rn = 2 AND r.s/r.nrm >= b.s1/r.nrm - 0.1))""".stripMargin
    val dedupe =
      if (multi) "SELECT DISTINCT src, dst FROM raw_edges"
      else "SELECT src, dst FROM raw_edges"
    s"""WITH RECURSIVE ${corpusCte()},
       |${sampleCte(2048)},
       |${fitCtes(8, 2)},
       |$assigned,
       |raw_edges AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.emb_d, b.emb_d)/(a.nrm*b.nrm) >= 0.25),
       |edges AS ($dedupe),
       |sym AS (SELECT src AS s, dst AS d FROM edges UNION SELECT dst, src FROM edges),
       |reach(s, d) AS (SELECT s, d FROM sym UNION SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s),
       |comp AS (SELECT s AS id, least(s, min(d)) AS comp FROM reach GROUP BY s)
       |SELECT e.vec_id, COALESCE(c.comp, e.vec_id) AS "group",
       |       e.vec_id = COALESCE(c.comp, e.vec_id) AS keep
       |FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  /** Oracle for `ann_topk_indexed`: the persisted IVF index's TRAINED
    * quantizer (k=16, iters=3 — ensureIvfIndex/buildIvfIndex defaults)
    * re-fitted in SQL; the query's top-2 trained cells' members rank by
    * exact round-4 cosine (the index stores the query vector too, so a
    * self-hit leads — annTopKIndexed's documented contract).
    */
  def annTopKIndexedSql: String =
    s"""WITH ${corpusCte()},
       |${sampleCte(4096)},
       |${fitCtes(16, 3)},
       |d AS (SELECT v.vec_id, v.emb_d, c.cell,
       |      list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
       |      FROM corpus v CROSS JOIN c3 c),
       |asg AS (SELECT vec_id, emb_d, sqrt(list_dot_product(emb_d, emb_d)) AS nrm, cell FROM (
       |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM d) WHERE rn = 1),
       |probe AS (SELECT cell AS pcell FROM (
       |      SELECT cell, row_number() OVER (ORDER BY s DESC, cell) AS rn FROM d WHERE vec_id = 0) WHERE rn <= 2),
       |q AS (SELECT emb_d AS qe, nrm AS qn FROM asg WHERE vec_id = 0)
       |SELECT a.vec_id, e.label, ROUND(list_dot_product(a.emb_d, q.qe)/(a.nrm*q.qn), 4) AS cosine
       |FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id, q
       |WHERE a.cell IN (SELECT pcell FROM probe)
       |ORDER BY cosine DESC, a.vec_id LIMIT 10""".stripMargin

  /** Oracle for `semantic_novel`: the even-id corpus is indexed under a
    * trained quantizer (k=16, iters=3 — buildIvfIndex's defaults); each
    * odd-id vector probes its top-2 cells and the best match at
    * unrounded cosine ≥ 0.25 decides novelty (max over the
    * (round-4 cosine, idx_id) struct — Spark's struct max, which DuckDB
    * struct comparison reproduces field-by-field).
    */
  def semanticNovelSql: String =
    s"""WITH ${corpusCte("vec_id % 2 = 0")},
       |${sampleCte(4096)},
       |${fitCtes(16, 3)},
       |idx AS (SELECT vec_id AS idx_id, emb_d AS idx_emb, sqrt(list_dot_product(emb_d, emb_d)) AS idx_nrm, cell FROM (
       |    SELECT v.vec_id, v.emb_d, c.cell,
       |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |             list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) DESC, c.cell) AS rn
       |    FROM corpus v CROSS JOIN c3 c) WHERE rn = 1),
       |odds AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d FROM embeddings WHERE vec_id % 2 = 1),
       |probing AS (SELECT vec_id, emb_d, sqrt(list_dot_product(emb_d, emb_d)) AS nrm, cell FROM (
       |    SELECT o.vec_id, o.emb_d, c.cell,
       |           row_number() OVER (PARTITION BY o.vec_id ORDER BY
       |             list_dot_product(o.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) DESC, c.cell) AS rn
       |    FROM odds o CROSS JOIN c3 c) WHERE rn <= 2),
       |matches AS (
       |  SELECT vec_id, max(struct_pack(c := ROUND(cos, 4), idx_id := idx_id)) AS m FROM (
       |    SELECT p.vec_id, list_dot_product(p.emb_d, i.idx_emb)/(p.nrm*i.idx_nrm) AS cos, i.idx_id
       |    FROM probing p JOIN idx i ON i.cell = p.cell) WHERE cos >= 0.25 GROUP BY vec_id)
       |SELECT o.vec_id, m.m IS NULL AS is_novel, m.m.c AS best_cos, m.m.idx_id AS match_id
       |FROM odds o LEFT JOIN matches m ON m.vec_id = o.vec_id
       |ORDER BY o.vec_id""".stripMargin

  /** Oracle for `semantic_outliers` (k=8, iters=4, z=2): full-corpus
    * assignment under the refit centroids, per-cell mean/second-moment
    * through DECIMAL(27,12) (fold-order-proof), σ from the exact
    * moments, UNROUNDED z cut (the `semantic_dedup` threshold
    * precedent), σ = 0 cells flag nothing. Output cells are 0-based
    * like the engine's IvfCellAssign.
    */
  def semanticOutliersSql(z: Double = 2.0): String =
    s"""WITH ${corpusCte()},
       |${sampleCte(2048)},
       |${fitCtes(8, 4)},
       |d AS (SELECT v.vec_id, v.emb_d, c.cell,
       |      list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
       |      FROM corpus v CROSS JOIN c4 c),
       |fa AS (SELECT vec_id, cell, s / sqrt(list_dot_product(emb_d, emb_d)) AS cos FROM (
       |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM d) WHERE rn = 1),
       |mo AS (SELECT cell,
       |      CAST(SUM(CAST(cos AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mu,
       |      CAST(SUM(CAST(cos*cos AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS m2
       |      FROM fa GROUP BY 1),
       |ms AS (SELECT cell, mu, sqrt(GREATEST(m2 - mu*mu, 0.0)) AS sigma FROM mo)
       |SELECT fa.vec_id, e.label, fa.cell - 1 AS cell,
       |  ROUND(cos, 4) AS cos_centroid,
       |  ROUND((cos - mu) / sigma, 4) AS zscore
       |FROM fa JOIN ms USING (cell) JOIN embeddings e ON e.vec_id = fa.vec_id
       |WHERE sigma > 0 AND cos < mu - $z * sigma
       |ORDER BY fa.vec_id""".stripMargin

  /** Oracle for `semantic_outliers_indexed`
    * ([[graft.ext.Similarity.outliersAgainstIndex]]): centroids AND
    * per-cell moments refit on the TRAINING half (vec_id < `split`,
    * sample cap 256·k over it), then every screened row (vec_id ≥
    * `split`) gets the frozen-model verdict — assignment, rounded
    * cosine/z-score, and the COALESCE(FALSE) outlier flag; a cell
    * empty at training time has no moments row, so its batch rows get
    * null zscore and are never flagged.
    */
  def semanticOutliersIndexedSql(z: Double = 2.0,
                                 split: Long = 450L): String =
    s"""WITH ${corpusCte(s"vec_id < $split")},
       |${sampleCte(2048)},
       |${fitCtes(8, 4)},
       |d AS (SELECT v.vec_id, v.emb_d, c.cell,
       |      list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
       |      FROM corpus v CROSS JOIN c4 c),
       |fa AS (SELECT vec_id, cell, s / sqrt(list_dot_product(emb_d, emb_d)) AS cos FROM (
       |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM d) WHERE rn = 1),
       |mo AS (SELECT cell,
       |      CAST(SUM(CAST(cos AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mu,
       |      CAST(SUM(CAST(cos*cos AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS m2
       |      FROM fa GROUP BY 1),
       |ms AS (SELECT cell, mu, sqrt(GREATEST(m2 - mu*mu, 0.0)) AS sigma FROM mo),
       |scr AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
       |      FROM embeddings WHERE vec_id >= $split),
       |sd AS (SELECT v.vec_id, v.label, v.emb_d, c.cell,
       |      list_dot_product(v.emb_d, list_transform(c.cf, x -> CAST(x AS DOUBLE))) AS s
       |      FROM scr v CROSS JOIN c4 c),
       |sa AS (SELECT vec_id, label, cell, s / sqrt(list_dot_product(emb_d, emb_d)) AS cos FROM (
       |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn FROM sd) WHERE rn = 1)
       |SELECT sa.vec_id, sa.label, sa.cell - 1 AS cell,
       |  ROUND(cos, 4) AS cos_centroid,
       |  CASE WHEN ms.sigma > 0 THEN ROUND((cos - mu) / sigma, 4) END AS zscore,
       |  COALESCE(ms.sigma > 0 AND cos < mu - $z * sigma, FALSE) AS is_outlier
       |FROM sa LEFT JOIN ms USING (cell)
       |ORDER BY sa.vec_id""".stripMargin
}
