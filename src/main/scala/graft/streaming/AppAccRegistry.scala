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
        val prev = accs.putIfAbsent(appId, acc)
        // a racing thread won: use its accumulator. The listener is
        // registered only by the WINNER (below), so losers no longer
        // leave an extra listener on the bus for the app's lifetime.
        if (prev != null) prev
        else {
          try {
            // register the eviction AFTER winning the put: the old
            // register-then-put order had a window where an
            // ApplicationEnd fired before the entry existed — the
            // removal removed nothing and the entry leaked permanently
            sc.addSparkListener(new SparkListener {
              override def onApplicationEnd(
                  e: SparkListenerApplicationEnd): Unit =
                accs.remove(appId)
            })
            // ...and the symmetric window: the app ended between the
            // put and the registration (listener lands on a drained
            // bus and never fires) — re-check and self-evict
            if (sc.isStopped) accs.remove(appId)
          } catch { case _: IllegalStateException | _: AssertionError =>
            // registration rejected ⇒ the context is stopped ⇒ the
            // entry we just put is dead — evict it ourselves
            accs.remove(appId)
          }
          acc
        }
      } catch { case _: IllegalStateException | _: AssertionError =>
        new LongAccumulator
      }
    }
  }

  /** Applications with a live entry — the lifecycle observable. */
  private[graft] def trackedCount: Int = accs.size()
}
