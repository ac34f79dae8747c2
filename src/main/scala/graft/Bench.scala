package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1-minute load average, read at a point in time. */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Number of OTHER running java processes. Concurrent JVMs distort
    * timings badly on this box (one round's driver artifacts were ~17%
    * inflated by an overlapping run); recording the count makes a
    * contaminated bench self-identifying instead of a silent regression.
    */
  private def competingJvms(): Int =
    try {
      // exclude this JVM and its ancestor chain (the sbt launcher that
      // forked us is a java process, but not a COMPETING one)
      var own = Set.empty[Long]
      var h: java.util.Optional[ProcessHandle] =
        java.util.Optional.of(ProcessHandle.current())
      while (h.isPresent) { own += h.get.pid(); h = h.get.parent() }
      val procs = new java.io.File("/proc").listFiles()
      if (procs == null) -1
      else procs.count { f =>
        f.getName.forall(_.isDigit) && !own.contains(f.getName.toLong) && {
          try {
            val cmd = java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"/proc/${f.getName}/cmdline"))
            // /proc cmdline is NUL-separated
            new String(cmd, "UTF-8").split('\u0000').headOption
              .exists(_.endsWith("java"))
          } catch { case _: Throwable => false }
        }
      }
    } catch { case _: Throwable => -1 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // ERROR, not WARN: the q91/q99/q117 global windows over ~3-row source
    // frames emit a WindowExec warning PER RUN, and that stderr flood has
    // pushed the result JSON line out of the driver's bounded output-tail
    // capture every round since r5 (BENCH_r0{5,6,7}.json all carry
    // parsed:null with a 2000-char tail of WindowExec noise)
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM/IO once so headline timings measure the queries, not
    // class-loading
    SparkEntry.queries.get("q06_forecast_revenue")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())
    // steady-state timing: queries run in the FIXED declaration order
    // (SparkEntry.benchQueries). The first run pays whole-stage-codegen
    // compilation and any model training (timed separately — see the
    // "build" section below), so the headline stays min-of-N — but N is
    // now ADAPTIVE: 3 runs baseline, extended to ≥5 for any query whose
    // min is still >0.5s, because the heavy tail is where this box's
    // scheduling noise lives (one round's driver artifact reported a
    // phantom 5x regression on q62 that two clean min-of-5 re-runs
    // disproved). Median rides along in `queries_median` so a noisy
    // distribution is visible IN the artifact instead of discovered by
    // re-running: min≈median ⇒ trust the number; median>>min ⇒ the run
    // was contaminated, compare mins only.
    // parameterized locally (driver always uses the defaults): RUNS for
    // quicker/sturdier local iterations, QUERIES to time a subset
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val heavyRuns = math.max(runs, 5)
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES").map(_.split(",").toSet)
    val loadStart = loadAvg()
    val jvmsStart = competingJvms()
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // the noop sink materializes EVERY output column. A count()
      // here lets Catalyst prune computed columns straight out of the
      // plan (an orderBy+count keeps only the sort key; an agg+count
      // keeps only group existence), so projection-heavy queries
      // timed 10-30x too fast — the signature queries were measuring
      // their scan, not their math.
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
    }
    val results: Seq[(String, Seq[Double])] = SparkEntry.benchQueries
      .filter(n => subset.forall(_.contains(n))).map { name =>
      // drain cross-query GC debt so query N's tail latency isn't
      // query N-1's garbage — part of the heavy-tail noise story
      System.gc()
      val fn = SparkEntry.queries(name)
      val base = (1 to runs).map(_ => timeOnce(fn))
      val times =
        if (base.min > 0.5 && base.min != Double.MaxValue)
          base ++ ((runs + 1) to heavyRuns).map(_ => timeOnce(fn))
        else base
      name -> times
    }
    def min(ts: Seq[Double]): Double =
      if (ts.min == Double.MaxValue) -1.0 else ts.min
    def median(ts: Seq[Double]): Double =
      if (ts.min == Double.MaxValue) -1.0
      else { val s = ts.sorted; s(s.length / 2) }
    // 3 decimals: ms precision is below this box's noise floor, and the
    // stdout line must stay WELL under the driver's ~2000-char output-tail
    // capture (full-precision medians+runs+build pushed it past that
    // bound even before the WindowExec noise)
    def f3(d: Double): String =
      if (d < 0) "-1" else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // per-query timings stay in the artifact (ordered as run) so future
    // rounds can separate noise from real regressions query-by-query
    val qs = results.map { case (k, ts) => s"\"" + k + "\":" + f3(min(ts)) }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, ts) => s"\"" + k + "\":" + f3(median(ts)) }
      .mkString("{", ",", "}")
    val qsRuns = results.map { case (k, ts) => s"\"" + k + "\":" + ts.length }
      .mkString("{", ",", "}")
    // the build phase — model training + index writes — is amortized by
    // Models.cached into the first run of whichever query needs each
    // artifact, so min-of-N serving times structurally cannot see it.
    // Emit it as its own section (inclusive times; dependency builds
    // nest — see Models.buildTimes).
    val build = graft.operators.Models.buildTimes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k.replace("\"", "'") + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(r => min(r._2)).sum else 0.0
    val totalMed = if (results.nonEmpty) results.map(r => median(r._2)).sum else 0.0
    // environment snapshot rides in the artifact: load average and
    // competing-JVM count at start and end make a contaminated run
    // (another Spark JVM sharing the box) self-identifying
    val env = s""""env":{"load_start":$loadStart,"load_end":${loadAvg()},""" +
      s""""competing_jvms_start":$jvmsStart,"competing_jvms_end":${competingJvms()}}"""
    // sink:noop marks the measurement methodology — numbers before this
    // field existed were count()-based and under-measured projection
    // queries (see the run-loop comment); cross-round comparisons are
    // only valid within the same sink
    // Two copies, one concern each:
    //  - bench_detail.json gets EVERYTHING (medians, run counts, build
    //    times, env snapshot) — the canonical artifact for humans;
    //  - stdout gets the minimal driver-contract line (metric, value,
    //    unit, queries, sf). The driver keeps only a ~2000-char tail of
    //    process output, and the full-detail line alone exceeds that —
    //    which is how every bench artifact since r5 ended up parsed:null.
    val detail =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sink":"noop","queries":$qs,""" +
      s""""total_median":${f3(totalMed)},"queries_median":$qsMed,"queries_runs":$qsRuns,""" +
      s""""build":$build,"sf":"$sfDir",$env}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_detail.json"), detail + "\n")
    catch { case _: Throwable => () }
    // stop BEFORE the println so executor/context shutdown chatter cannot
    // land after the JSON line in the captured output tail
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sink":"noop",""" +
      s""""queries":$qs,"sf":"$sfDir","detail":"bench_detail.json"}""")
  }
}
