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
  *  - `correctness_attest.json` (written at sweep end; per-query entries
  *    also appear in `_progress.jsonl` as they complete): a SPARK-SIDE
  *    record of every query's on-disk result — row count, sorted
  *    column:type signature, and an order-independent multiset hash of the
  *    written parquet (xxhash64 over the "|"-joined string-cast cells of
  *    each row with columns sorted by name; combined across rows with
  *    bit_xor and a 2^64-wrapped sum, so file/partition order cannot move
  *    it). Two Verify runs over the same code+data produce identical
  *    attest files, so even a driver whose DuckDB compare step dies (the
  *    r7/r8 `CORRECTNESS_r0N.json = {}` failure) still holds a complete,
  *    diffable correctness record: diff its attest against the committed
  *    `CORRECTNESS_ATTEST.json`. This hash is engine-side evidence — the
  *    cross-engine value check remains `tools/oracle_check.py`.
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

    // Spark-side attest of what Verify actually wrote: re-read the parquet
    // (attests the on-disk artifact, not the in-memory plan), sort columns
    // by name, string-cast every cell (nulls → a sentinel no cast
    // produces), and reduce xxhash64 of the joined row strings with the
    // two order-independent combiners. Fully distributed — no collect.
    def attest(s: SparkSession, path: String): (Long, String, String, String) = {
      import org.apache.spark.sql.functions._
      val back = s.read.parquet(path)
      val fields = back.schema.fields.sortBy(_.name)
      val colSig = fields.map(f => f.name + ":" + f.dataType.simpleString)
        .mkString(",")
      // escape \ | and NUL inside cell values before joining, so a cell
      // containing the separator (or a literal NUL, the null sentinel)
      // cannot make two distinct rows collide (ADVICE r9). At current
      // data no committed cell contains \ or | — the escaping changed
      // ZERO committed hashes (verified by full-gate rerun) — and any
      // future cell that does will intentionally drift the attest.
      val rowStr = concat_ws("|", fields.toIndexedSeq.map(f =>
        coalesce(
          regexp_replace(col(f.name).cast("string"),
            "[\\\\|\u0000]", "\\\\$0"),
          lit("\u0000"))): _*)
      val agg = back.select(xxhash64(rowStr).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
          sum(col("h").cast("decimal(38,0)")).as("s")).head()
      val n = agg.getLong(0)
      val x = if (agg.isNullAt(1)) 0L else agg.getLong(1)
      val sm =
        if (agg.isNullAt(2)) BigInt(0)
        else BigInt(agg.getDecimal(2).toBigInteger).mod(BigInt(2).pow(64))
      (n, f"$x%016x", sm.toString(16), colSig)
    }
    val attests = new java.util.concurrent.ConcurrentHashMap[String, String]()

    val poolSize = math.min(12, math.max(4, cpus.toInt * 2))
    val pool = Executors.newFixedThreadPool(poolSize)
    val failures = new AtomicInteger(0)
    ordered.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val t0 = System.nanoTime()
          try {
            val s = spark.newSession()
            // runtime-settable subset only: static configs (spark.serializer)
            // are builder-time and already inherited from the parent context
            Tables.sessionRuntimeConfigs.foreach { case (k, v) => s.conf.set(k, v) }
            s.conf.set("spark.sql.shuffle.partitions", cpus)
            fn(s, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
            // the attest re-read is evidence infrastructure, not the
            // query: if it fails the parquet the driver scores was still
            // written, so keep ok:true, don't touch `failures`, and record
            // an attest-specific error instead (ADVICE r9)
            try {
              val (rows, xor, summ, cols) = attest(s, s"$outDir/$name")
              attests.put(name,
                s"""{"rows": $rows, "xor64": ${q(xor)}, "sum64": ${q(summ)}, "cols": ${q(cols)}}""")
              val sec = (System.nanoTime() - t0) / 1e9
              logLine(f"""{"name": ${q(name)}, "ok": true, "sec": $sec%.3f, "rows": $rows, "xor64": ${q(xor)}}""")
            } catch { case ae: Throwable =>
              val amsg = Option(ae.getMessage).getOrElse(ae.getClass.getName)
              System.err.println(s"[verify] $name attest failed (query itself ok): $amsg")
              attests.put(name, s"""{"attest_err": ${q(amsg.take(300))}}""")
              val sec = (System.nanoTime() - t0) / 1e9
              logLine(f"""{"name": ${q(name)}, "ok": true, "sec": $sec%.3f, "attest_err": ${q(amsg.take(300))}}""")
            }
          } catch { case e: Throwable =>
            failures.incrementAndGet()
            val sec = (System.nanoTime() - t0) / 1e9
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            System.err.println(s"[verify] $name failed: $msg")
            attests.put(name, s"""{"err": ${q(msg.take(300))}}""")
            logLine(f"""{"name": ${q(name)}, "ok": false, "sec": $sec%.3f, "err": ${q(msg.take(300))}}""")
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)
    // final consolidated attest (sorted keys → byte-stable across runs)
    val attestJson = {
      import scala.jdk.CollectionConverters._
      attests.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"  ${q(k)}: $v" }
        .mkString("{\n", ",\n", "\n}\n")
    }
    Files.writeString(Paths.get(s"$outDir/correctness_attest.json"), attestJson)
    System.err.println(s"[verify] ${ordered.size - failures.get} ok, " +
      s"${failures.get} failed / ${ordered.size} queries; " +
      s"attest → $outDir/correctness_attest.json")
    spark.stop()
  }
}
