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
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/IO once so headline timings measure the queries, not
    // class-loading
    SparkEntry.queries.get("q06_forecast_revenue")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())
    // steady-state timing: queries run in the FIXED declaration order
    // (SparkEntry.benchQueries), min of THREE runs each — the first run
    // pays whole-stage-codegen compilation, and min-of-3 narrows the
    // ±30% machine variance that made round-over-round deltas ambiguous
    // parameterized locally (driver always uses the defaults): RUNS for
    // quicker/sturdier local iterations, QUERIES to time a subset
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES").map(_.split(",").toSet)
    val loadStart = loadAvg()
    val jvmsStart = competingJvms()
    val results: Seq[(String, Double)] = SparkEntry.benchQueries
      .filter(n => subset.forall(_.contains(n))).map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
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
      name -> (if (times.min == Double.MaxValue) -1.0 else times.min)
    }
    // per-query timings stay in the artifact (ordered as run) so future
    // rounds can separate noise from real regressions query-by-query
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // environment snapshot rides in the artifact: load average and
    // competing-JVM count at start and end make a contaminated run
    // (another Spark JVM sharing the box) self-identifying
    val env = s""""env":{"load_start":$loadStart,"load_end":${loadAvg()},""" +
      s""""competing_jvms_start":$jvmsStart,"competing_jvms_end":${competingJvms()}}"""
    // sink:noop marks the measurement methodology — numbers before this
    // field existed were count()-based and under-measured projection
    // queries (see the run-loop comment); cross-round comparisons are
    // only valid within the same sink
    println(s"""{"metric":"total","value":$total,"unit":"sec","sink":"noop","queries":$qs,"sf":"$sfDir",$env}""")
    spark.stop()
  }
}
