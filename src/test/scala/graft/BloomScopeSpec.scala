package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFunctions

/** The sized bloom build must get its raised
  * `runtime.bloomFilter.maxNumItems/maxNumBits` clamps WITHOUT touching
  * the shared session's confs: a concurrent query planning its
  * optimizer-injected runtime filters must never see the raised caps,
  * and a racing cache fill must never leave them permanently altered.
  * The build runs under a cloned session (private SQLConf, shared
  * SparkContext), so both hazards vanish structurally.
  */
class BloomScopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sized bloom past the default clamps: filter gets the requested " +
      "bits; the shared session's clamp confs stay untouched") {
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val before = Seq(itemsKey, bitsKey).map(k => spark.conf.getOption(k))
    val keys = spark.range(1000).select(col("id").as("g"))
    // floorItems 8M > the 4M default items clamp; the computed width
    // (-n ln fpp / ln²2 ≈ 76.7M bits) > the 2^26 default bits clamp —
    // a clamped build would mis-size k AND cap the buffer at 8.39 MB
    val bloom = BloomFunctions.trainBloomSizedCached(
      s"scopespec:${System.nanoTime()}", keys, col("g"),
      fpp = 0.01, floorItems = 8L << 20, floorBits = 1L << 20)
    val bytes = spark.range(1).select(bloom.as("b"))
      .head().getAs[Array[Byte]](0)
    // requested ≈76.7M bits ≈ 9.58 MB serialized; the default clamp
    // would have capped it at 2^26 bits = 8.39 MB
    assert(bytes.length > 9000000,
      s"filter clamped: ${bytes.length} bytes — raised caps not applied")
    // no false negatives on the inserted keys
    val misses = spark.range(1000).select(col("id").as("g"))
      .filter(!BloomFunctions.mightContain(bloom, col("g"))).count()
    assert(misses == 0, s"$misses false negatives")
    val after = Seq(itemsKey, bitsKey).map(k => spark.conf.getOption(k))
    assert(after == before,
      s"shared session confs mutated by the build: $before -> $after")
  }
}
