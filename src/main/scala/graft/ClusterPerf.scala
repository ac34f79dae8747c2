package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Multi-JVM PERF rig for the third-decade analytics spillers (VERDICT
  * r13 task 3): q154/q156 at 1000× spill 790 MB / 7.7 GB under
  * `local[32]` + 32 static shuffle partitions — a partition-count
  * artifact (3M rows of sort input per task), and PLANS.md's
  * prescription (size post-shuffle partitions to 128–256 MB of sort
  * input via AQE advisory sizing) could not be validated in-process:
  * a single-JVM `local[N]` shares one heap across all task slots, so
  * no static local dial reproduces a cluster's per-executor memory
  * boundary. This main runs the queries on `local-cluster[W,C,M]` —
  * real forked executor JVMs with their OWN heaps — under AQE
  * coalescing sized by `advisoryPartitionSizeInBytes`, and reports
  * wall/shuffle/spill per query so the prescription is measured, not
  * prose.
  *
  * Args: master sfDir queryCsv shufflePartitions advisoryMB
  *   e.g. local-cluster[2,16,24576] /tmp/graft_stress/x1000 \
  *        q154_retention_cohorts,q156_session_paths 512 128
  * `shufflePartitions` is the AQE INITIAL partition number — set it
  * high and let coalescing find the advisory size (parallelismFirst is
  * disabled so the advisory target is honored, per the AQE docs).
  * Needs SPARK_HOME (worker launch) when the master is local-cluster.
  * Prints one CLUSTERPERF json line per query.
  */
object ClusterPerf {

  private final class MetricsListener extends SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { shuffleWrite.set(0); spill.set(0) }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println(
        "usage: ClusterPerf <master> <sfDir> <queryCsv> <shufflePartitions> <advisoryMB>")
      sys.exit(2)
    }
    val Array(master, dir, queryCsv, parts, advisoryMB) = args.take(5)
    // executors are forked plain-java processes (ClusterSmoke's
    // discipline): they need this JVM's classpath (the graft classes
    // live in sbt's dependency classpath, not SPARK_HOME/jars) and the
    // JDK17 --add-opens set spark-submit would inject
    val cp = System.getProperty("java.class.path")
    val moduleOpts =
      org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()
    val execMem = sys.env.getOrElse("CLUSTERPERF_EXECUTOR_MEM", "8g")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", moduleOpts)
      .config("spark.executor.memory", execMem)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      // CLUSTERPERF_COALESCE=0 gives the STATIC control: AQE on (join
      // planning unchanged) but partition count pinned at the initial
      // value — the configuration whose spill the prescription targets
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("CLUSTERPERF_COALESCE", "1") != "0")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (advisoryMB.toLong << 20).toString)
      // honor the advisory SIZE: by default AQE prefers parallelism and
      // ignores the advisory target when coalescing would reduce
      // parallelism below the cluster's slot count
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config(GraftConf.ObjAggFallbackKey, GraftConf.ObjAggFallbackEntries)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    // multi-process proof, same discipline as ClusterSmoke: the numbers
    // below mean nothing if the tasks never left the driver JVM
    val driverPid = ProcessHandle.current().pid()
    val execPids = spark.sparkContext
      .parallelize(1 to 64, 64)
      .map(_ => ProcessHandle.current().pid()).distinct().collect().toSet
    println(s"""CLUSTERPERF_ENV {"master":"$master","driver_pid":$driverPid,""" +
      s""""executor_pids":[${execPids.mkString(",")}],""" +
      s""""multi_jvm":${execPids.size >= 2 && !execPids.contains(driverPid)},""" +
      s""""initial_partitions":$parts,"advisory_mb":$advisoryMB}""")
    queryCsv.split(",").filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        metrics.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // the listener bus is async — drain it before reading, or the
        // final stage's completion event (often the one carrying the
        // spill this rig exists to measure) may still be queued
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark)
        (wall, metrics.shuffleWrite.get(), metrics.spill.get())
      }
      val (warm, shW, sp) = times.last
      println(s"""CLUSTERPERF {"query":"$name","master":"$master",""" +
        s""""initial_partitions":$parts,"advisory_mb":$advisoryMB,""" +
        s""""cold_sec":${times.head._1},"warm_sec":$warm,""" +
        s""""shuffle_write_bytes":$shW,"spilled_bytes":$sp}""")
    }
    spark.stop()
    // local-cluster leaves non-daemon RPC threads; exit explicitly
    sys.exit(0)
  }
}
