package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Source fingerprinting for persisted derived indexes (the BM25
  * postings index, the IVF vector index): "the index exists" is not
  * "the index is FRESH" — if the source table is regenerated at the
  * same path, an ensure keyed only on a `_SUCCESS` marker silently
  * serves results computed from the OLD data. The stamp ties an index
  * directory to the exact file state of its source: the sorted
  * (name, size, mtime) listing of every data file, hashed. Listing a
  * source directory is a metadata-only operation (no data read), so an
  * ensure-with-stamp costs one namenode/object-store listing per query
  * session — nothing at data scale.
  */
object IndexStamp {

  /** Fingerprint of a source file/directory: md5 over the recursive
    * (ROOT-RELATIVE file path, length, mtime) listing, order-fixed by
    * name. The relative path — not just the file name — is hashed, so
    * renaming or swapping partition directories (`region=EU/` ↔
    * `region=US/`, which preserves every file's name/size/mtime but
    * changes row semantics) changes the stamp. Any rewrite of the
    * source — new files, resized files, touched files — changes it too.
    */
  def fingerprint(spark: SparkSession, sourcePath: String): String = {
    val root = new Path(sourcePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path, rel: String): Unit = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).sortBy(_.getPath.getName).foreach { s =>
          val name = s.getPath.getName
          walk(s.getPath, if (rel.isEmpty) name else s"$rel/$name")
        }
      else entries += s"$rel:${st.getLen}:${st.getModificationTime}"
    }
    walk(root, "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** The shared ensure protocol for stamped indexes: fresh = the marker
    * exists AND (no source given, or the stored stamp equals the
    * source's current fingerprint); otherwise `build` runs and the new
    * stamp is recorded — AFTER the build, so a failed build leaves no
    * stamp claiming freshness.
    */
  def ensureFresh(spark: SparkSession, markerPath: String,
                  indexPath: String, sourcePath: Option[String])
                 (build: => Unit): Unit = {
    val marker = new Path(markerPath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = sourcePath.map(fingerprint(spark, _))
    val fresh = fs.exists(marker) &&
      (want.isEmpty || read(spark, indexPath) == want)
    if (!fresh) {
      build
      want.foreach(write(spark, indexPath, _))
    }
  }

  /** Next unused ingest id for the partitioned index layout: max
    * existing `ingest=` id + 1 (one metadata listing; non-numeric
    * suffixes like `__HIVE_DEFAULT_PARTITION__` are ignored). Shared by
    * both index families so id-assignment policy lives in one place.
    */
  private[graft] def nextIngestId(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: Path): Long =
    ingestIds(fs, dir).foldLeft(-1L)(math.max) + 1L

  /** Whether a partitioned index directory holds any DATA partition —
    * a committed empty base (cold-start initialization) has a
    * `_SUCCESS` marker but zero `ingest=` directories, and reading it
    * as parquet would fail schema inference. Readers gate on this, not
    * on the marker.
    */
  private[graft] def hasIngestData(fs: org.apache.hadoop.fs.FileSystem,
                                   dir: Path): Boolean =
    fs.exists(dir) &&
      Option(fs.globStatus(new Path(dir, "ingest=*"))).exists(_.nonEmpty)

  /** The ingest ids present under a partitioned index directory — the
    * multi-table consistency probe (BM25's postings and stats must
    * carry the SAME id set; a mismatch means a crash landed between
    * the two writes of one append).
    */
  private[graft] def ingestIds(fs: org.apache.hadoop.fs.FileSystem,
                               dir: Path): Set[Long] =
    if (!fs.exists(dir)) Set.empty
    else Option(fs.globStatus(new Path(dir, "ingest=*"))).toSeq.flatten
      .flatMap(_.getPath.getName.stripPrefix("ingest=").toLongOption)
      .toSet

  /** Shared append skeleton for the partitioned index families (BM25 /
    * IVF / PQ) — the cold-start probe, stamp invalidation, and
    * ingest-id policy live in ONE place so a lifecycle fix cannot
    * silently miss an index family (three hand-rolled copies predated
    * this). Semantics: when `markerPath` is absent and the id is auto
    * (batch callers), run `fullBuild` and STOP; when absent and the id
    * is explicit (stream callers), run `coldInit` (the empty-base
    * self-initialization that makes the batch land in its own
    * replayable partition); then always drop the `_source_stamp` under
    * `stampRoot` BEFORE `writeBatch(id)` mutates partitions (a crash
    * mid-append must never leave a mutated index that still claims
    * source freshness). `ingestDir` is the directory whose `ingest=`
    * children define the id namespace for auto-assignment.
    */
  private[graft] def appendLifecycle(spark: SparkSession, stampRoot: String,
      markerPath: String, ingestDir: String, ingestId: Long)
      (fullBuild: => Unit)(coldInit: => Unit)
      (writeBatch: Long => Unit): Unit = {
    val marker = new Path(markerPath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      if (ingestId < 0) {
        // Invalidate BEFORE the full build too: a family whose build
        // overwrites only subdirectories (BM25's postings/stats) would
        // otherwise leave a pre-crash stamp claiming source freshness
        // for an index now built from this batch alone.
        invalidate(spark, stampRoot)
        fullBuild
        return
      }
      coldInit
    }
    invalidate(spark, stampRoot)
    val id = if (ingestId >= 0) ingestId
      else nextIngestId(fs, new Path(ingestDir))
    writeBatch(id)
  }

  /** Drop a commit marker ahead of a multi-directory rebuild — the
    * sibling-layout counterpart of wiping the index root: a build that
    * rewrites several directories must first ensure no stale marker
    * can survive a mid-build crash and vouch for a mixed-corpora
    * index.
    */
  private[graft] def dropMarker(spark: SparkSession,
                                markerPath: String): Unit = {
    val p = new Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Reader-side gate for the top-k index readers. A MISSING index (no
    * marker) fails loudly — a typo'd path or never-built index must
    * never serve an empty ranking as if it were a real answer — while
    * a committed empty base (marker present, zero `ingest=`
    * partitions: the cold-start crash window) returns true so the
    * reader yields its typed empty frame instead of failing parquet
    * schema inference. (The semantic-dedup screen deliberately does
    * NOT use this: for an incremental dedup, "no corpus yet" is a
    * legitimate state whose answer is all-novel, marker or not.)
    */
  private[graft] def emptyCommittedIndex(spark: SparkSession,
      markerPath: String, ingestDir: String): Boolean = {
    val marker = new Path(markerPath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker),
      s"no index at $ingestDir ($markerPath missing) — build or ensure " +
        "it first")
    !hasIngestData(fs, new Path(ingestDir))
  }

  private def stampPath(indexPath: String) =
    new Path(indexPath, "_source_stamp")

  /** The stamp recorded when the index was built, if any. */
  def read(spark: SparkSession, indexPath: String): Option[String] = {
    val p = stampPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Record the source stamp next to a freshly built index. */
  def write(spark: SparkSession, indexPath: String, stamp: String): Unit = {
    val p = stampPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((stamp + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Drop the stamp — used after an incremental append, when the index
    * no longer derives from any single source directory state; a
    * subsequent source-stamped ensure will rebuild from scratch.
    */
  def invalidate(spark: SparkSession, indexPath: String): Unit = {
    val p = stampPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }
}
