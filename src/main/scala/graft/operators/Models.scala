package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide registry of trained model artifacts — IVF centroids, PQ
  * codebooks, BPE merge tables, materialized index frames. Training is a
  * BUILD step whose product is reused by every query that follows (the
  * production shape: an index is built once, then served), so one
  * `Verify`/`Bench` run must train each (input, hyperparameters)
  * combination exactly once, not once per query.
  *
  * Keys MUST encode both the input identity (the dataset directory —
  * immutable for the life of a process) and every hyperparameter, so two
  * configurations never alias (the lesson from the bloom cache:
  * a tag without its parameters silently serves the wrong filter).
  * Entries live for the life of the JVM, like
  * `BloomFunctions.trainBloomCached`; artifacts are driver-side literals
  * of bounded size (k·dim centroids, M·K·SubDim codebooks, the merge
  * table), so the cache cannot grow past #models × #datasets.
  */
object Models {

  /** One cache entry: the trainer, deferred behind a lazy val. Training
    * runs OUTSIDE `computeIfAbsent` — the mapping function only allocates
    * this holder. That makes `cached` reentrant: a trainer may itself call
    * `cached` for a dependency (ivfPqIndex → ivfCents), which
    * ConcurrentHashMap forbids inside a mapping function (recursive-update
    * IllegalStateException whenever the two keys land in the same bin —
    * i.e. crash-or-not depended on the dataset-dir string's hash).
    * `lazy val` still guarantees at-most-once evaluation per key; the
    * dependency graph is acyclic and every trainer acquires dependencies
    * in the same order, so holder monitors cannot deadlock.
    */
  private final class Holder(train: () => AnyRef) {
    lazy val value: AnyRef = train()
  }

  private val cache = new ConcurrentHashMap[String, Holder]()
  private val trains = new ConcurrentHashMap[String, AtomicLong]()
  private val buildSecs = new ConcurrentHashMap[String, java.lang.Double]()

  /** The artifact under `key`, training it on first use. `train` runs at
    * most once per key per process, and may itself call `cached` for its
    * dependencies (see [[Holder]]).
    */
  def cached[T <: AnyRef](key: String)(train: => T): T =
    cache.computeIfAbsent(key, _ => new Holder(() => {
      trains.computeIfAbsent(key, _ => new AtomicLong).incrementAndGet()
      val t0 = System.nanoTime()
      try train
      finally buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
    })).value.asInstanceOf[T]

  /** How many times `key`'s trainer has actually run (spec probe: N
    * queries sharing one model must leave this at 1).
    */
  def timesTrained(key: String): Long =
    Option(trains.get(key)).map(_.get()).getOrElse(0L)

  /** Cold-cache build wall-time per key, seconds. Times are INCLUSIVE:
    * a trainer that pulls a dependency through `cached` (ivfPqIndex →
    * ivfCents) counts the dependency's first build inside its own time —
    * subtract the child key to decompose. `Bench` emits this as the
    * artifact's `"build"` section, making the build phase (training +
    * index writes, amortized away by the cache and invisible to min-of-N
    * serving times) a measured number instead of a blind spot.
    */
  def buildTimes: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
}
