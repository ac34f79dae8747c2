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

  def get(spark: SparkSession): LongAccumulator = {
    val sc = spark.sparkContext
    val appId = sc.applicationId
    val cached = accs.get(appId)
    if (cached != null) cached
    else {
      // a read AFTER the context stopped used to return the (now
      // evicted) cached accumulator; re-registering on the stopped bus
      // throws — tolerate it and hand back a DETACHED accumulator
      // (value 0: the counts died with the app) instead of turning a
      // teardown read into a crash. Nothing is cached in that case, so
      // the lifecycle observable stays zero after stop. (Mutation never
      // happens inside a computeIfAbsent mapping — the map forbids it.)
      try {
        val acc = sc.longAccumulator(name)
        sc.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            accs.remove(appId)
        })
        val prev = accs.putIfAbsent(appId, acc)
        // a racing thread won: use its accumulator (the extra listener
        // just re-removes the same key — harmless)
        if (prev != null) prev else acc
      } catch { case _: IllegalStateException | _: AssertionError =>
        new LongAccumulator
      }
    }
  }

  /** Applications with a live entry — the lifecycle observable. */
  private[graft] def trackedCount: Int = accs.size()
}
