package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Per-application named [[LongAccumulator]] registry — the shared
  * implementation behind every streaming telemetry counter
  * ([[DocsStream.displacedReps]], [[PretrainStream.overConnectMerges]],
  * [[EmbedStream.capOverflows]], [[EventsStream.anchorRewinds]]):
  * one accumulator per SparkContext, task-side adds, driver-side reads.
  *
  * Lifecycle: the entry is REMOVED when its application ends — the same
  * `onApplicationEnd` discipline as
  * [[graft.operators.PhaseStats]]'s listener map. Without it, a JVM
  * cycling many sessions (notebook, test harness) leaks one accumulator
  * entry per application; `SparkContext.stop` posts ApplicationEnd and
  * drains the bus before returning, so by the time `stop()` completes
  * the entry is gone ([[PhaseStatsCycle]] observes exactly this).
  */
private[graft] final class AppAccRegistry(name: String) {
  private val accs =
    new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()

  def get(spark: SparkSession): LongAccumulator =
    accs.computeIfAbsent(spark.sparkContext.applicationId, appId => {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          accs.remove(appId)
      })
      spark.sparkContext.longAccumulator(name)
    })

  /** Applications with a live entry — the lifecycle observable. */
  private[graft] def trackedCount: Int = accs.size()
}
