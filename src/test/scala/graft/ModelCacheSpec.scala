package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Models

/** [[graft.operators.Models]]: trained artifacts (IVF centroids, PQ
  * codebooks, BPE merge tables) are process-wide build products — every
  * query that consumes one must reuse the first training run, the way
  * q88/q101 already share one bloom filter.
  */
class ModelCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("PQ codebooks train once across q108/q116/q109") {
    SparkEntry.queries("q108_pq_encode")(spark, dir).count()
    assert(Models.timesTrained(s"pq:$dir:rounds=1") == 1,
      "first consumer must train the codebooks exactly once")
    SparkEntry.queries("q116_pq_stats")(spark, dir).count()
    SparkEntry.queries("q109_pq_search")(spark, dir).count()
    assert(Models.timesTrained(s"pq:$dir:rounds=1") == 1,
      "later consumers must reuse the trained codebooks")
  }

  test("BPE merge table trains once across q113/q114") {
    SparkEntry.queries("q113_bpe_train")(spark, dir).count()
    SparkEntry.queries("q114_bpe_encode")(spark, dir).count()
    assert(Models.timesTrained(s"bpe:$dir:rounds=4") == 1)
  }

  test("IVF centroids train once across assignment, search, and IVF-PQ") {
    SparkEntry.queries("q67_ivf_assign")(spark, dir).count()
    SparkEntry.queries("q68_ivf_search")(spark, dir).count()
    SparkEntry.queries("q110_ivfpq_search")(spark, dir).count()
    assert(Models.timesTrained(s"ivf:$dir:k=8,rounds=2") == 1)
  }

  test("a trainer may depend on another cached artifact, even on hash-colliding keys") {
    // "Aa" and "BB" have identical String.hashCode, so with equal prefixes
    // the full keys collide into the same ConcurrentHashMap bin — the exact
    // condition under which a computeIfAbsent-resident trainer calling
    // cached() for a dependency threw IllegalStateException("Recursive
    // update"). The holder design trains outside the map computation, so
    // nesting must work regardless of where the keys hash.
    val outer = Models.cached("modelcachespec:nest:Aa") {
      val dep = Models.cached("modelcachespec:nest:BB")(Seq(41))
      Seq(dep.head + 1)
    }
    assert(outer == Seq(42))
    assert(Models.timesTrained("modelcachespec:nest:Aa") == 1)
    assert(Models.timesTrained("modelcachespec:nest:BB") == 1)
    // and the dependency is served, not retrained, for later consumers
    assert(Models.cached("modelcachespec:nest:BB")(Seq(0)) == Seq(41))
    assert(Models.timesTrained("modelcachespec:nest:BB") == 1)
  }

  test("distinct hyperparameters never alias to one artifact") {
    val k1 = Models.cached("modelcachespec:a:p=1")(Seq(1))
    val k2 = Models.cached("modelcachespec:a:p=2")(Seq(2))
    assert(k1 != k2)
    assert(Models.timesTrained("modelcachespec:a:p=1") == 1)
    assert(Models.timesTrained("modelcachespec:a:p=2") == 1)
  }
}
