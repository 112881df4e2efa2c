package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-versioned table format — the metadata-commit layer that
  * [[Sinks.compact]]'s scaladoc defers to ("a production TABLE FORMAT would
  * instead commit the rewrite as a metadata swap so readers never observe
  * the gap"): the file-list-manifest core of Iceberg/Delta-style tables,
  * reduced to what the snapshot guarantees actually require.
  *
  * Layout under the table root:
  *   data/v<N>/part-*.parquet   — files written by commit N (immutable)
  *   _manifests/v<N>.list       — newline-separated ABSOLUTE file list of
  *                                snapshot N (the whole table state)
  *
  * The guarantees, and where they come from:
  *  - **Snapshot isolation**: a reader resolves a manifest ONCE and scans
  *    exactly those files; data files are immutable and never deleted by
  *    commits, so later appends/overwrites/compactions cannot change or
  *    tear an in-flight read. At 100 TB this is what lets a 6-hour batch
  *    job run against a table that ingests continuously.
  *  - **Time travel**: any retained version re-reads bit-identically
  *    (`read(spark, path, Some(v))`) — the reproducibility contract a
  *    training-data pipeline needs to re-materialize the exact corpus a
  *    model saw.
  *  - **Atomic commit with optimistic concurrency**: a commit stages its
  *    data files, then publishes by creating `_manifests/v<N+1>.list` with
  *    create-exclusive semantics — two racing committers cannot both win
  *    version N+1; the loser throws and retries against the new head.
  *    Readers either see version N or N+1, never a partial state.
  *  - **Compaction without a gap**: `commitCompaction` rewrites the
  *    current snapshot into fewer files as a NEW version — unlike the
  *    file-level [[Sinks.compact]] delete+rename, concurrent readers of
  *    the old version keep a complete file list throughout.
  *
  * Scale note: the manifest is one small object per version (file PATHS,
  * not data), so commit cost is O(files touched), independent of table
  * size — the property that makes metadata commits cheap at 100 TB where
  * any data rewrite is not.
  */
object Snapshots {

  private def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Int) =
    new Path(manifestDir(root), s"v$v.list")

  private val VName = "v(\\d+)\\.list".r

  /** Highest committed version, or None for an empty/uninitialized table. */
  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val dir = manifestDir(root)
    val fs = hfs(spark, dir)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
        case VName(n) => n.toInt
      }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The immutable file list of snapshot `v`. */
  def snapshotFiles(spark: SparkSession, root: String, v: Int): Seq[String] = {
    val mp = manifestPath(root, v)
    val fs = hfs(spark, mp)
    require(fs.exists(mp), s"no snapshot v$v at $root")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Read a snapshot (default: latest). The returned frame is pinned to
    * the resolved file list — later commits do not affect it. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    spark.read.parquet(snapshotFiles(spark, root, v): _*)
  }

  /** Stage `df` as new data files and publish snapshot latest+1.
    * `append = true` keeps the previous snapshot's files in the new
    * manifest; `false` makes the new files the whole table (logical
    * overwrite — old files stay on disk for time travel). Returns the
    * committed version. Throws [[java.nio.file.FileAlreadyExistsException]]
    * semantics (an IOException) if a racing commit won the version. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      append: Boolean): Int = {
    val prev = latestVersion(spark, root)
    val v = prev.getOrElse(0) + 1
    val dataDir = new Path(root, s"data/v$v")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val fs = hfs(spark, dataDir)
    val fresh = fs.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .map(_.toString).sorted
    val carried =
      if (append) prev.map(snapshotFiles(spark, root, _)).getOrElse(Nil)
      else Nil
    publish(spark, root, v, carried ++ fresh)
    v
  }

  /** Rewrite the CURRENT snapshot into `nFiles` files and publish it as a
    * new version — OPTIMIZE as a metadata commit: concurrent readers of
    * any older version keep their complete file list (no delete+rename
    * gap, unlike [[Sinks.compact]]). Returns the committed version. */
  def commitCompaction(spark: SparkSession, root: String, nFiles: Int): Int = {
    val v = latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    commit(spark, root, read(spark, root, Some(v)).repartition(nFiles),
      append = false)
  }

  /** Create-exclusive manifest publish — the optimistic lock: the stream
    * is opened with overwrite = false, so the slower of two racing
    * committers fails here instead of clobbering the winner. */
  private def publish(spark: SparkSession, root: String, v: Int,
      files: Seq[String]): Unit = {
    val mp = manifestPath(root, v)
    val fs = hfs(spark, mp)
    fs.mkdirs(mp.getParent)
    val out = fs.create(mp, /* overwrite = */ false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
