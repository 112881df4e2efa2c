package graft.engine

/** Per-JVM scratch area for queries that materialize a LAYOUT as part of
  * their answer (q_bucket_join, q_zorder_write). Two properties the layout
  * queries need and a bare `/tmp/...<hashCode>` path cannot give:
  *
  *  - **No cross-run collisions**: the root is a fresh
  *    `Files.createTempDirectory` per JVM, so two concurrent builds (driver
  *    verify + a local sbt run) never race one build's write against the
  *    other's lazy read-back, and 32-bit `hashCode` collisions between
  *    different data dirs can't alias two layouts onto one path.
  *  - **No leak**: a shutdown hook deletes the whole root when the JVM
  *    exits, so repeated rounds don't accrete rewritten table copies.
  *
  * `token(dir)` sanitizes the full input-dir string (not its hashCode) into
  * an identifier-safe suffix, so within a JVM each scale-factor dir still
  * gets its own distinct layout path/table name.
  */
object Scratch {

  private lazy val root: java.io.File = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_").toFile
    sys.addShutdownHook(deleteRecursively(r))
    r
  }

  /** A unique-per-JVM scratch path for `name`; parent dirs created. */
  def dir(name: String): String = {
    val f = new java.io.File(root, name)
    f.getParentFile.mkdirs()
    f.getAbsolutePath
  }

  /** Identifier-safe token derived from the FULL dir string (injective up
    * to the `[^A-Za-z0-9]` classes it collapses — distinct sf dirs map to
    * distinct tokens, unlike a 32-bit hashCode). */
  def token(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
