package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Built to survive a constrained driver config (default local[4]):
  *  - `oracle_sql.json` is written FIRST, so a mid-sweep timeout still
  *    leaves the driver everything it needs to score the queries that
  *    finished (each query's parquet dir appears as it completes).
  *  - The dump loop runs on a bounded thread pool. Spark schedules
  *    concurrent jobs from multiple threads fine, and much of a small
  *    query's wall time is single-threaded driver planning, so modest
  *    oversubscription (2× cores, capped) roughly halves the sweep even
  *    at local[4]. Each worker gets its OWN `spark.newSession()` clone:
  *    same SparkContext + cache, but an isolated temp-view catalog and
  *    SQLConf, so the `v_orders`-style views and the streaming replays'
  *    session-conf tweaks (Extended18.runToCompletion) cannot race.
  *  - No `coalesce(1)`: the compare canonicalizes row order and globs all
  *    part files, and forcing one task serialized each query's compute.
  *  - `_progress.jsonl` records one line per query (name, ok, seconds) as
  *    it completes — partial evidence plus per-query timings for the
  *    bench-noise comparison even if the process is killed.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // dev-loop filter (the driver never sets it): only dump queries whose
    // name matches one of the comma-separated prefixes
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }

    // Submit the known-heavy families first so stragglers overlap the
    // small-query tail instead of running alone at the end (classic
    // longest-processing-time-first; the exact order doesn't matter,
    // only that multi-second queries aren't all queued last).
    val heavy = Seq("st", "dedup", "tp6_", "tp8_", "tp26", "tp2_", "g10",
      "r8", "r9", "r12", "t24", "v11", "v12", "ann", "a22", "mm", "j9",
      "graphbuild", "s12", "e24", "t29", "tp30")
    val ordered = selected.toSeq.sortBy { case (name, _) =>
      if (heavy.exists(name.startsWith)) 0 else 1 }

    val progressPath = Paths.get(s"$outDir/_progress.jsonl")
    Files.deleteIfExists(progressPath)
    def logLine(line: String): Unit = synchronized {
      Files.writeString(progressPath, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    val poolSize = math.min(12, math.max(4, cpus.toInt * 2))
    val pool = Executors.newFixedThreadPool(poolSize)
    val failures = new AtomicInteger(0)
    ordered.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val t0 = System.nanoTime()
          try {
            val s = spark.newSession()
            Tables.sessionConfigs.foreach { case (k, v) => s.conf.set(k, v) }
            s.conf.set("spark.sql.shuffle.partitions", cpus)
            fn(s, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
            val sec = (System.nanoTime() - t0) / 1e9
            logLine(f"""{"name": ${q(name)}, "ok": true, "sec": $sec%.3f}""")
          } catch { case e: Throwable =>
            failures.incrementAndGet()
            val sec = (System.nanoTime() - t0) / 1e9
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            System.err.println(s"[verify] $name failed: $msg")
            logLine(f"""{"name": ${q(name)}, "ok": false, "sec": $sec%.3f, "err": ${q(msg.take(300))}}""")
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)
    System.err.println(s"[verify] ${ordered.size - failures.get} ok, " +
      s"${failures.get} failed / ${ordered.size} queries")
    spark.stop()
  }
}
