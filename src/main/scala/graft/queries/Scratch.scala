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
}
