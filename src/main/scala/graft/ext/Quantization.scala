package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecSumAgg
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Product quantization (PQ) — the memory side of the ANN stack: each
  * embedding splits into `m` subvectors, each subvector is replaced by
  * the id of its nearest codeword in a per-subspace L2 codebook, and
  * search scores against the `m`-byte codes instead of the raw floats
  * (asymmetric distance computation, ADC). At 100 TB of embeddings the
  * raw vectors do not fit anywhere hot — 64 floats become `m` small
  * ints (16× smaller at m=4 before bit-packing), which is what lets a
  * candidate set live in memory next to an IVF cell ([[Similarity]]'s
  * coarse quantizer composes with this one: IVF prunes WHICH vectors
  * to score, PQ shrinks WHAT is scored).
  *
  * Scale shape: training iterates over (sub, code) aggregates — all
  * `m` subspaces update in ONE job per iteration (the subvector stream
  * explodes row-locally, then one hash-keyed aggregate over m·k
  * groups); the driver holds only the m×k×(dim/m) codebook, exactly
  * the [[Similarity.kmeansFit]] contract. Encoding and ADC scoring are
  * row-local expressions against broadcast codebook literals — the
  * nearest-codeword argmin reuses the codegen'd dot-argmax kernel
  * ([[graft.functions.IvfCellAssign]]) through the classic
  * extended-coordinate trick: argmin‖x−c‖² = argmax(x·c − ‖c‖²/2), so
  * appending 1.0 to the vector and −‖c‖²/2 to each codeword turns the
  * L2 argmin into the dot argmax the kernel already computes.
  */
object Quantization {

  private def subvec(embedding: Column, s: Int, dsub: Int): Column =
    slice(embedding, s * dsub + 1, dsub)

  /** Every PQ entry point shares this guard: a non-dividing m would
    * silently slice past-the-end dims out of every code and score.
    */
  private def dsubFor(m: Int, dim: Int): Int = {
    val dsub = dim / m
    require(m * dsub == dim, s"dim=$dim must split into m=$m equal subspaces")
    dsub
  }

  private def extendBook(book: Seq[Seq[Float]]): Seq[Seq[Float]] =
    book.map(c => c :+ (-0.5 * c.map(x => x.toDouble * x).sum).toFloat)

  /** Nearest codeword by L2 distance, via the shared dot-argmax kernel
    * and the extended-coordinate reduction (first-best tie-break, like
    * every quantizer here). One precision caveat: the −‖c‖²/2 term is
    * stored as a FLOAT alongside the codeword, so two codewords whose
    * squared distances differ by less than a float ulp (~6e-8 near
    * unit norm — e.g. a collapsed cluster split across two codes) can
    * assign to either; deterministic, but "nearest" is exact only up
    * to that rounding.
    */
  private[ext] def codeFor(v: Column, book: Seq[Seq[Float]]): Column =
    Similarity.cellFor(concat(v, array(lit(1.0f))), extendBook(book))

  /** The m-code array for an embedding — shared by [[pqEncode]] and
    * the IVF×PQ composition so the codec has one definition.
    */
  private def codesCol(books: Seq[Seq[Seq[Float]]], dim: Int): Column = {
    val dsub = dsubFor(books.length, dim)
    array(books.indices.map(s =>
      codeFor(subvec(col("embedding"), s, dsub), books(s))): _*)
  }

  /** The query-side subvector projections (q0..q{m-1}) and the ADC
    * score that consumes them — one definition for both rankers.
    */
  private def querySubs(m: Int, dsub: Int): Seq[Column] =
    (0 until m).map(s => subvec(col("embedding"), s, dsub).as(s"q$s"))

  private def adcScore(books: Seq[Seq[Seq[Float]]]): Column =
    round(books.indices.map(s =>
        vec_dot(col(s"q$s"),
          element_at(typedLit(books(s)), col("codes").getItem(s) + 1)))
      .reduce(_ + _), 4)

  /** Train per-subspace L2 codebooks (m × k × dim/m), Lloyd iterations
    * with deterministic seeded init and keep-old-on-empty like
    * [[Similarity.kmeansFit]]; the update is mean = fixed-point sum /
    * count, so the result is partition-invariant.
    *
    * Trains on the same bounded deterministic sample as the coarse
    * quantizer ([[Similarity.trainSample]]; `sampleCap` < 0 ⇒ 256·k,
    * 0 disables): fitting m × k codewords never needs the full corpus,
    * and the full-corpus pass a PQ index build pays is the one ENCODE
    * scan, not `iters` training scans. A corpus at or under the cap
    * trains exactly as the unsampled fit.
    */
  def pqTrain(emb: DataFrame, m: Int = 4, k: Int = 16, iters: Int = 4,
              dim: Int = 64, seed: Long = 11L,
              sampleCap: Int = -1): Seq[Seq[Seq[Float]]] = {
    val dsub = dsubFor(m, dim)
    val cap = if (sampleCap < 0) 256 * k else sampleCap
    val doCache = cap > 0 && iters > 1
    val train = if (doCache) Similarity.trainSample(emb, cap).persist()
      else Similarity.trainSample(emb, cap)
    try {
      var books: Seq[Seq[Seq[Float]]] =
        (0 until m).map(s => Similarity.centroids(k, dsub, seed + s))
      for (_ <- 0 until iters) {
        val parts = (0 until m).map { s =>
          struct(lit(s).as("sub"),
            codeFor(subvec(col("embedding"), s, dsub), books(s)).as("code"),
            subvec(col("embedding"), s, dsub).as("v"))
        }
        val sums = train
          .select(explode(array(parts: _*)).as("a"))
          .select(col("a.sub"), col("a.code"), col("a.v"))
          .groupBy("sub", "code")
          .agg(VecSumAgg.vec_sum_fixed(col("v"), dsub).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val byKey = sums.map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getSeq[Double](2), r.getLong(3))).toMap
        books = books.zipWithIndex.map { case (book, s) =>
          book.zipWithIndex.map { case (old, c) =>
            byKey.get((s, c)) match {
              case Some((sum, n)) if n > 0 => sum.map(x => (x / n).toFloat)
              case _ => old
            }
          }
        }
      }
      books
    } finally if (doCache) { train.unpersist(); () }
  }

  /** Replace each vector by its m codeword ids — the compressed form a
    * PQ index stores (row-local; the codebook rides in the expression).
    */
  def pqEncode(emb: DataFrame, books: Seq[Seq[Seq[Float]]],
               dim: Int = 64): DataFrame =
    emb.select(col("vec_id"), col("label"),
      codesCol(books, dim).as("codes"))

  /** The PQ reconstruction x̂ (concatenated codewords) — the decode side
    * of the codec, used by the MSE convergence spec and recall drills.
    */
  def pqDecode(codes: Column, books: Seq[Seq[Seq[Float]]]): Column =
    concat(books.zipWithIndex.map { case (book, s) =>
      element_at(typedLit(book), codes.getItem(s) + 1)
    }: _*)

  /** ADC top-k: the query keeps its raw subvectors (asymmetric — only
    * the CORPUS side is quantized), each corpus vector contributes
    * Σ_s q_s · book_s[code_s] = q · x̂, computed as m codebook lookups
    * against broadcast literals — no raw corpus vectors are read past
    * the (pre-computable) encode step. Output is the approximate
    * inner-product ranking; recall vs the exact ranker is pinned in
    * QuantizationSpec. Like [[Similarity.annTopKIndexed]] (and unlike
    * [[Similarity.cosineTopK]]), a stored vector querying for itself
    * appears in its own results — filter `vec_id` if self-hits are
    * unwanted.
    */
  def pqTopK(emb: DataFrame, books: Seq[Seq[Seq[Float]]], queryId: Long,
             k: Int, dim: Int = 64): DataFrame = {
    val dsub = dsubFor(books.length, dim)
    val q = emb.filter(col("vec_id") === queryId)
      .select(querySubs(books.length, dsub): _*)
    pqEncode(emb, books, dim).crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), adcScore(books).as("adc_ip"))
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(k)
  }

  /** Two-stage retrieval — the production ANN SERVING pattern: PQ-ADC
    * scores the CODES to shortlist `kCand` candidates (the only
    * corpus-wide pass, over 8-byte codes instead of 256-byte raw
    * vectors), then EXACT cosine reranks just those candidates against
    * the raw table — a kCand-row broadcast semi-join, never a second
    * corpus scan. Latency follows the codes scan; recall follows the
    * shortlist, and the sizing rule is NOT "kCand ≫ k" alone: vectors
    * in the same ADC code cell TIE, ranked only by id, so kCand must
    * cover the query's code-cell population (PqDrill measures 0.10
    * recall@10 at kCand = 100 under a ~4000-member tie class, 1.00 at
    * 2× the class — see SCALE.md; finer codes, larger m·log₂k, shrink
    * the class). Composes
    * with the IVF prune and the persisted index exactly like
    * [[pqTopK]]→[[pqTopKIvf]]→[[pqTopKIndexed]]; self-hit contract as
    * [[pqTopK]] (the stored query vector reranks to cosine 1.0 and
    * leads).
    */
  def pqRerank(emb: DataFrame, books: Seq[Seq[Seq[Float]]], queryId: Long,
               k: Int, kCand: Int = 100, dim: Int = 64): DataFrame = {
    val cand = pqTopK(emb, books, queryId, kCand, dim).select("vec_id")
    exactRerankById(emb, cand, queryId, k)
  }

  /** The exact-cosine second stage shared by every rerank flavor: a
    * candidate-row broadcast semi-join against the raw table — at
    * scale an id-keyed point lookup, never a corpus scan.
    */
  private def exactRerankById(emb: DataFrame, cand: DataFrame,
                              queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"),
        vec_norm(col("embedding")).as("q_norm"))
    emb.join(cand, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("embedding"), col("q_embedding")) /
          (vec_norm(col("embedding")) * col("q_norm")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** The tie-class-complete shortlist threshold: the highest ADC score
    * at which the cumulative tie-class population reaches `k` — every
    * vector scoring at or above it is a candidate. Vectors tying on the
    * rounded ADC score are ranked only by id, so any FIXED kCand that
    * cuts inside a tie class silently drops members the exact stage
    * never sees (PqDrill measured recall@10 = 0.10 at kCand=100 under a
    * ~4,000-member tie class — the r11 verdict's sizing-law finding);
    * thresholding at the class boundary makes the shortlist exactly as
    * large as the corpus's score structure requires, with recall equal
    * to the ADC tie-class ranking's — the best any ADC-scored shortlist
    * can do. The histogram is over DISTINCT rounded scores — bounded by
    * the code-cell count (kᵐ, 65,536 at m=4·k=16), never the corpus —
    * so the single-partition running-sum window is bounded metadata,
    * the [[graft.ext.Vocab]] 1-row-argmax rule. A corpus smaller than
    * `k` thresholds at −∞ (everything shortlists).
    */
  private def adcThreshold(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("adc_ip").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.groupBy("adc_ip").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .filter(col("cum") >= k)
      .agg(coalesce(max(col("adc_ip")), lit(Double.MinValue))
        .as("adc_threshold"))
  }

  /** [[pqRerank]] with the shortlist AUTO-SIZED from the corpus's ADC
    * score structure instead of a hand-tuned kCand: candidates are all
    * vectors scoring at or above [[adcThreshold]], so the shortlist
    * always covers whole tie classes and recall never silently degrades
    * when a template-heavy corpus inflates a class past a constant
    * (the r11 kCand sizing law, executed instead of documented). Costs
    * one extra pass over the 8-byte CODES (the histogram) — still never
    * a second raw-vector scan. The chosen size and threshold are
    * observable (`Dataset.observe`: `kcand_effective`,
    * `adc_threshold_observed`) under `observeName` — unique per plan,
    * the [[Dedup.capBandBuckets]] rule.
    */
  def pqRerankAuto(emb: DataFrame, books: Seq[Seq[Seq[Float]]],
                   queryId: Long, k: Int, dim: Int = 64,
                   observeName: String = "pq_rerank_auto"): DataFrame = {
    val dsub = dsubFor(books.length, dim)
    val q = emb.filter(col("vec_id") === queryId)
      .select(querySubs(books.length, dsub): _*)
    val scored = pqEncode(emb, books, dim).crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), adcScore(books).as("adc_ip"))
    val cand = scored.crossJoin(broadcast(adcThreshold(scored, k)))
      .filter(col("adc_ip") >= col("adc_threshold"))
      .observe(observeName, count(lit(1)).as("kcand_effective"),
        min(col("adc_ip")).as("adc_threshold_observed"))
      .select("vec_id")
    exactRerankById(emb, cand, queryId, k)
  }

  /** The production pairing: the IVF coarse quantizer prunes WHICH
    * vectors are scored (only the query's `nprobe` nearest cells — at
    * scale, partition-pruned files, as in the persisted IVF index) and
    * PQ shrinks WHAT is scored (m codes per vector instead of raw
    * floats). Same contract as [[Similarity.annTopKIvf]] (probe
    * selection is the SHARED [[Similarity.probeCellsExpr]], so the two
    * rankers cannot drift), with the scoring side swapped from
    * raw-vector dots to ADC lookups — the scored candidate set never
    * touches a raw corpus vector. Self-hit contract as [[pqTopK]].
    */
  def pqTopKIvf(emb: DataFrame, books: Seq[Seq[Seq[Float]]], queryId: Long,
                k: Int, dim: Int = 64, nlist: Int = 16,
                nprobe: Int = 2): DataFrame = {
    val dsub = dsubFor(books.length, dim)
    val cs = Similarity.centroids(nlist, dim, 7L)
    val listed = emb.select(col("vec_id"), col("label"),
      Similarity.cellFor(col("embedding"), cs).as("cell"),
      codesCol(books, dim).as("codes"))
    val q = emb.filter(col("vec_id") === queryId)
      .select(querySubs(books.length, dsub) :+
        Similarity.probeCellsExpr(cs, nprobe).as("probe_cells"): _*)
    listed.join(broadcast(q),
        array_contains(col("probe_cells"), col("cell")))
      .select(col("vec_id"), col("label"), adcScore(books).as("adc_ip"))
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // Persisted PQ index — codes at rest instead of raw vectors: the
  // repeated-query form of [[pqTopKIvf]], and the full 100-TB story:
  // cell partitions prune WHICH files are read, and those files hold m
  // small ints per vector instead of dim floats (16× less at rest for
  // m=4 × 64 float dims before bit-packing).
  // ---------------------------------------------------------------------

  /** Deterministic index directory for a testdata dir (resolved under
    * [[IndexStamp.indexRoot]]), its own family like the BM25/IVF
    * indexes. Version history (the
    * `graft-ivf2-` discipline — every layout change is a new directory
    * family so an old layout can't be served to a new reader): pq2
    * added (dim, nlist) meta columns to `_books`; pq3 added the
    * `ingest` partition level above `cell` for idempotent appends.
    */
  def pqIndexPathFor(sfDir: String): String =
    IndexStamp.pathUnderRoot(
      "graft-pq3-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** Materialize the PQ index: (vec_id, label, codes) PARTITIONED BY
    * the IVF cell — no raw embeddings at rest. The codebook rides in an
    * underscore-prefixed `_books` side table (invisible to the parquet
    * reader of the rows, like `_SUCCESS`/`_source_stamp`) and is
    * written LAST: its `_SUCCESS` is the index's freshness marker, so a
    * crash between the rows write and the books write leaves no marker
    * and the next ensure re-runs the build. Lifecycle scope: build +
    * stale detection + incremental append + streaming twin, like the
    * BM25/IVF indexes. Code rows are independent given a FROZEN
    * codebook, so appends follow [[Similarity.appendIvfIndex]]'s
    * ingest-partition pattern; RETRAINING the codebook is a rebuild by
    * definition — codes are meaningless across codebooks.
    */
  def buildPqIndex(emb: DataFrame, path: String,
                   books: Seq[Seq[Seq[Float]]], dim: Int = 64,
                   nlist: Int = 16): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    pqRowsFor(emb, books, dim, nlist).withColumn("ingest", lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("ingest", "cell").parquet(path)
    // The build parameters ride WITH the codebook (constant columns) so
    // queries derive dim/nlist from the index instead of trusting the
    // caller to repeat the build's arguments — a dim or nlist mismatch
    // would silently truncate ADC tables / probe alien cell ids.
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, code) => (s, code, c, dim, nlist) }
    }.toDF("sub", "code", "centroid", "dim", "nlist").coalesce(1)
      .write.mode("overwrite").parquet(path + "/_books")
  }

  /** Index rows for a vector batch — shared by the full build and the
    * incremental append: codes and cell are pure functions of the
    * embedding, the FROZEN codebook, and the seeded coarse centroids,
    * so appended vectors get exactly the rows a rebuild (with the same
    * codebook) would give them.
    */
  private def pqRowsFor(emb: DataFrame, books: Seq[Seq[Seq[Float]]],
                        dim: Int, nlist: Int): DataFrame = {
    // Executor-side fail-fast on a dimension mismatch: slicing and the
    // dot kernels silently operate on the common prefix, so a batch
    // from a different embedding model would otherwise get garbage
    // codes/cells with no error (the index's dim wins over any caller
    // argument — this guard is what makes that safe).
    val checked = when(size(col("embedding")) === dim, col("embedding"))
      .otherwise(raise_error(concat(
        lit(s"PQ index expects $dim-dim embeddings, got "),
        size(col("embedding")).cast("string"),
        lit(" (vec_id "), col("vec_id").cast("string"), lit(")"))))
    emb.select(col("vec_id"), col("label"), checked.as("embedding"))
      .select(col("vec_id"), col("label"),
        codesCol(books, dim).as("codes"),
        Similarity.cellFor(col("embedding"),
          Similarity.centroids(nlist, dim, 7L)).as("cell"))
  }

  /** Incremental PQ maintenance: encode a batch of NEW vectors with the
    * index's STORED codebook and land it as its own dynamically-
    * overwritten `ingest=` partition — idempotent per `ingestId`, same
    * replay/cold-start/single-writer contract as
    * [[Similarity.appendIvfIndex]]. On a cold start the codebook is
    * trained on the FIRST batch and frozen (`m`/`k`/`iters` apply only
    * then); every later append encodes with the stored books, so an
    * appended index equals a rebuild OVER THE SAME CODEBOOK exactly
    * (QuantizationSpec). Retraining on the grown corpus is
    * [[buildPqIndex]] — a rebuild, never an append.
    */
  def appendPqIndex(emb: DataFrame, path: String, m: Int = 4,
                    k: Int = 16, iters: Int = 3, dim: Int = 64,
                    nlist: Int = 16, ingestId: Long = -1L): Unit = {
    val spark = emb.sparkSession
    // Set only by the cold branch, so the warm path reads the STORED
    // codebook and the cold path doesn't re-read what it just wrote.
    var justBuilt: Option[(Seq[Seq[Seq[Float]]], Int, Int)] = None
    def trainCold(): Seq[Seq[Seq[Float]]] = {
      // An empty cold-start batch would FREEZE a pure seeded-noise
      // codebook (pqTrain's keep-old-on-empty) and silently wreck
      // every later append's codes — fail loudly instead.
      require(!emb.isEmpty,
        "cold-start appendPqIndex on an empty batch would freeze an " +
          "untrained (seeded-noise) codebook; append a non-empty first " +
          "batch or buildPqIndex with an explicit codebook")
      pqTrain(emb, m, k, iters, dim)
    }
    IndexStamp.appendLifecycle(spark, path, s"$path/_books/_SUCCESS",
        path, ingestId) {
      buildPqIndex(emb, path, trainCold(), dim, nlist)
    } {
      val books = trainCold()
      buildPqIndex(emb.limit(0), path, books, dim, nlist)
      justBuilt = Some((books, dim, nlist))
    } { id =>
      val (books, idxDim, idxNlist) =
        justBuilt.getOrElse(loadBooksMeta(spark, path))
      // One task (and so one file) per cell: without the repartition
      // every shuffle task writes its own file into every cell dir —
      // ~shuffle.partitions× the files per append (Bm25Drill measured
      // the decay this causes at 122 ingests).
      pqRowsFor(emb, books, idxDim, idxNlist).withColumn("ingest", lit(id))
        .repartition(col("cell"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest", "cell").parquet(path)
    }
  }

  /** Compact the PQ index: fold every `ingest=` partition of code rows
    * into the base (ingest 0), one file per cell — the
    * [[Similarity.compactIvfIndex]] re-layout for the codes index. The
    * `_books` side table (codebook + build params) is NOT touched:
    * codes stay valid because the codebook they were encoded with is
    * unchanged — which is also why the fold is corpus-invariant and
    * `pqTopKIndexed` over the compacted index equals the appended and
    * rebuilt index exactly (QuantizationSpec). Folded-id replays no-op;
    * `_source_stamp` untouched; crash-safe/resumable per
    * [[IndexStamp.compactLifecycle]]. Returns false on ≤ 1 ingest.
    */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean =
    IndexStamp.compactLifecycle(spark, path, s"$path/_books/_SUCCESS",
        Seq(path)) { case Seq(stg) =>
      spark.read.parquet(path)
        .select(col("vec_id"), col("label"), col("codes"), col("cell"))
        .withColumn("ingest", lit(0L))
        .repartition(col("cell"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("ingest", "cell")
        .parquet(stg)
    }

  /** Read the codebook back in (sub, code) order — the k·dim floats a
    * query needs on the driver to build its ADC tables.
    */
  def loadBooks(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[Seq[Seq[Float]]] =
    loadBooksMeta(spark, path)._1

  /** The codebook plus the (dim, nlist) the index was BUILT with. */
  def loadBooksMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): (Seq[Seq[Seq[Float]]], Int, Int) = {
    val rows = IndexStamp.schemaMemoRead(spark, path + "/_books").collect()
    val byS = rows.groupBy(_.getInt(0))
    val books = (0 until byS.size).map { s =>
      byS(s).sortBy(_.getInt(1)).map(_.getSeq[Float](2)).toSeq
    }
    (books, rows.head.getInt(3), rows.head.getInt(4))
  }

  /** Build the index only when absent or source-STALE — the
    * [[graft.ext.IndexStamp]] contract the BM25/IVF ensures share.
    */
  def ensurePqIndex(spark: org.apache.spark.sql.SparkSession,
                    emb: => DataFrame, path: String, m: Int = 4,
                    k: Int = 16, iters: Int = 3, dim: Int = 64,
                    nlist: Int = 16,
                    sourcePath: Option[String] = None): Boolean =
    IndexStamp.ensureFresh(spark, s"$path/_books/_SUCCESS", path,
      sourcePath) {
      buildPqIndex(emb, path, pqTrain(emb, m, k, iters, dim), dim, nlist)
    }

  /** ADC top-k over the PERSISTED index: the scan carries a static
    * `cell IN (probed…)` partition filter (only the probed cells' files
    * are read — QuantizationSpec asserts it on the formatted plan) and
    * the per-subspace lookup tables qᵀ·book are precomputed ON THE
    * DRIVER (m·k doubles), so the executors do nothing but table
    * lookups and a sum per candidate — textbook ADC. The driver dot is
    * the shared [[Similarity.driverDot]] fold (bit-identical to
    * [[graft.functions.FloatVecDot]]), so scores — and therefore
    * rows — are EXACTLY [[pqTopKIvf]]'s (QuantizationSpec pins the
    * equality). `dim` and `nlist` come FROM the index (stored with the
    * codebook at build time), never from the caller — a repeated-wrong
    * argument cannot silently truncate tables or probe alien cells.
    */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, queryVec: Array[Float], k: Int,
                    nprobe: Int = 2): DataFrame =
    pqScoredIndexed(spark, indexPath, queryVec, nprobe)
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(k)

  /** The probed-cell ADC scoring every indexed consumer ranks or
    * thresholds: (vec_id, label, adc_ip) for the query's `nprobe`
    * cells, scored by driver-precomputed lookup tables over the
    * at-rest codes.
    */
  private def pqScoredIndexed(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, queryVec: Array[Float],
                              nprobe: Int): DataFrame = {
    // A MISSING index fails loudly inside the gate; a committed empty
    // base (cold-start crash window: _books marker, zero ingest=
    // partitions) yields an empty ranking — but only AFTER the query
    // vector is validated against the stored dim, so a wrong-model
    // client fails immediately, not once the first batch lands.
    val empty = IndexStamp.emptyCommittedIndex(spark,
      s"$indexPath/_books/_SUCCESS", indexPath)
    val (books, dim, nlist) = loadBooksMeta(spark, indexPath)
    require(queryVec.length == dim,
      s"query has ${queryVec.length} dims, index built with $dim")
    if (empty)
      return spark.range(0).select(col("id").as("vec_id"),
        lit(0).as("label"), lit(0.0).as("adc_ip"))
    val dsub = dsubFor(books.length, dim)
    val tables: Seq[Seq[Double]] = books.zipWithIndex.map { case (book, s) =>
      book.map(c => Similarity.driverDot(queryVec, c, s * dsub)).toSeq
    }
    // The PQ coarse quantizer is the SEEDED centroid set pqRowsFor
    // assigns cells with (the stored nlist/dim reproduce it exactly);
    // unlike the IVF index there is no trained _centroids side table.
    val cells = Similarity.probeCells(queryVec,
      Similarity.centroids(nlist, dim, 7L), nprobe)
    // Corpus-shaped codes table: cache-routed like the IVF/BM25 reads
    // (default OFF = identical plain scan; probed-cell pruning via
    // partition dirs direct, cached-batch stats when resident).
    IndexCache.read(spark, indexPath)
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"), col("label"),
        round(tables.zipWithIndex.map { case (t, s) =>
            element_at(typedLit(t), col("codes").getItem(s) + 1) }
          .reduce(_ + _), 4).as("adc_ip"))
  }

  /** [[pqRerank]] over the PERSISTED index — the deployment form of
    * two-stage retrieval: cell-pruned at-rest CODES generate the
    * `kCand` shortlist ([[pqTopKIndexed]]; raw vectors never read),
    * then exact cosine reranks only the shortlist against the raw
    * `emb` table (kCand-row broadcast semi-join — at scale an
    * id-keyed point lookup, never a corpus scan). The kCand sizing
    * rule is [[pqRerank]]'s, tightened by the probe: candidates come
    * only from the query's `nprobe` cells, so kCand bounds work
    * WITHIN the probed population.
    */
  def pqRerankIndexed(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, emb: DataFrame,
                      queryVec: Array[Float], k: Int, kCand: Int = 100,
                      nprobe: Int = 2): DataFrame = {
    val cand = pqTopKIndexed(spark, indexPath, queryVec, kCand, nprobe)
      .select("vec_id")
    exactRerankByVec(emb, cand, queryVec, k)
  }

  private def exactRerankByVec(emb: DataFrame, cand: DataFrame,
                               queryVec: Array[Float], k: Int): DataFrame = {
    val qNorm = math.sqrt(queryVec.map(x => x.toDouble * x).sum)
    emb.join(cand, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("embedding"), typedLit(queryVec.toSeq)) /
          (vec_norm(col("embedding")) * lit(qNorm)), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** [[pqRerankIndexed]] with the [[pqRerankAuto]] auto-sized
    * shortlist: the threshold histogram runs over the PROBED cells'
    * at-rest codes (the same cell-pruned scan the shortlist reads —
    * two passes over pruned 8-byte codes, never a raw-vector scan),
    * so kCand covers whole tie classes WITHIN the probed population.
    * Same observability contract (`kcand_effective`,
    * `adc_threshold_observed` under `observeName`).
    */
  def pqRerankIndexedAuto(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, emb: DataFrame,
                          queryVec: Array[Float], k: Int, nprobe: Int = 2,
                          observeName: String = "pq_rerank_indexed_auto")
      : DataFrame = {
    val scored = pqScoredIndexed(spark, indexPath, queryVec, nprobe)
    val cand = scored.crossJoin(broadcast(adcThreshold(scored, k)))
      .filter(col("adc_ip") >= col("adc_threshold"))
      .observe(observeName, count(lit(1)).as("kcand_effective"),
        min(col("adc_ip")).as("adc_threshold_observed"))
      .select("vec_id")
    exactRerankByVec(emb, cand, queryVec, k)
  }
}
