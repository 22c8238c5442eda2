package graft.queries

/** Per-process scratch directories for sink/source round-trip queries.
  * The pid component keeps concurrent JVMs (bench running beside a test
  * suite) from racing overwrite-vs-read on the same path; within one
  * process the path is stable so mode("overwrite") keeps re-runs clean.
  */
private[graft] object Scratch {
  def dir(tag: String, sfDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${ProcessHandle.current().pid()}_" +
        sfDir.replaceAll("[^a-zA-Z0-9]", "_")).getAbsolutePath

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serialize one-time fixture staging of `dir`: Verify's parallel
    * workers can hit the same check-then-build block concurrently; the
    * loser of this lock re-checks `_READY` and skips the build.
    */
  def sync[T](dir: String)(body: => T): T =
    locks.computeIfAbsent(dir, _ => new Object).synchronized(body)
}
