package graft.oracle

/** DuckDB-SQL generator reproducing the engine's BPE vocabulary
  * induction ([[graft.ext.Vocab.learnBpeMerges]] / `bpeTokenCounts`):
  * the word histogram is the training frame, each of the 16 merge
  * rounds takes the (pair_count DESC, left, right) argmax over adjacent
  * symbol pairs and applies the merge greedy-leftmost, and token
  * accounting joins the final symbols-per-word back to documents.
  *
  * The greedy-leftmost single-merge pass is a left fold: append the
  * symbol unless the accumulator's last element is `l` and the current
  * is `r`, in which case replace the last with `l||r`. This is
  * equivalent to the engine's index-skipping scan because a merged
  * symbol can never itself match as the LEFT of the same merge (that
  * would need l = l||r, impossible for non-empty r) — so "aaa" under
  * (a,a) folds to [aa, a] exactly like the scan.
  *
  * Every iteration CTE is MATERIALIZED: `t{i}` is referenced by both
  * the next word frame and the final UNION, and DuckDB inlines
  * non-materialized CTEs per reference — the 16-round chain would
  * otherwise re-derive the whole history exponentially.
  *
  * Scope guard: the engine stops early when the best pair's count
  * falls under 2; the unrolled SQL always emits 16 rounds. On the
  * driver's corpus every round clears the floor (16 rows in every
  * verify run) — a corpus that stops early would need a running
  * stop-flag CTE threaded through.
  */
object BpeSql {
  private val Iters = 16

  private def chain: String = {
    val parts = new StringBuilder(
      """w0 AS MATERIALIZED (SELECT w, list_transform(range(1, length(w)+1), i -> substr(w, i, 1)) AS toks, cnt FROM (
        |  SELECT w, count(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents) WHERE length(w) > 0 GROUP BY w))""".stripMargin)
    for (i <- 1 to Iters) {
      parts ++= s""",
pc$i AS (SELECT toks[j] AS l, toks[j+1] AS r, SUM(cnt) AS c
  FROM w${i - 1}, UNNEST(range(1, len(toks))) AS u(j) GROUP BY 1, 2),
t$i AS MATERIALIZED (SELECT l, r, c FROM pc$i ORDER BY c DESC, l, r LIMIT 1),
w$i AS MATERIALIZED (SELECT w, list_reduce(list_prepend([]::VARCHAR[], list_transform(toks, x -> [x])),
    (acc, xl) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = t.l AND xl[1] = t.r
                 THEN list_append(acc[1:len(acc)-1], t.l || t.r)
                 ELSE list_append(acc, xl[1]) END) AS toks, cnt
  FROM w${i - 1}, t$i t)"""
    }
    parts.toString
  }

  /** Oracle for `bpe_merges`: (rank, left, right, pair_count). */
  def mergesSql: String =
    "WITH " + chain + ",\nmg AS (" +
      (1 to Iters).map(i =>
        s"""SELECT $i AS rank, l AS "left", r AS "right", c::BIGINT AS pair_count FROM t$i""")
        .mkString(" UNION ALL ") +
      ") SELECT * FROM mg ORDER BY rank"

  /** Oracle for `bpe_encode`: per-doc word and BPE-token counts under
    * the 16 learned merges (empty docs emit (0, 0)).
    */
  def encodeSql: String =
    "WITH " + chain + s""",
tk AS (SELECT w, len(toks) AS tpw FROM w$Iters),
dw AS (SELECT doc_id, w, count(*) AS n_w FROM (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) WHERE length(w) > 0 GROUP BY doc_id, w),
agg AS (SELECT dw.doc_id, SUM(dw.n_w) AS n_words, SUM(dw.n_w * tk.tpw) AS n_bpe_tokens
  FROM dw JOIN tk ON tk.w = dw.w GROUP BY dw.doc_id)
SELECT d.doc_id, COALESCE(a.n_words, 0)::BIGINT AS n_words, COALESCE(a.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id ORDER BY d.doc_id"""
}
