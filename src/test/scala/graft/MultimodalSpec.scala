package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.queries.Tables

/** Multimodal batched-imperative plumbing: schemas, batch shape,
  * determinism, zero-shuffle plans, and agreement between the imperative
  * decode stage and the q53 expression formulas.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.withMedia(Tables(spark, dir, "documents"))

  test("decode stage: typed schema, deterministic, matches q53 expression math") {
    val meta = Multimodal.decodeMeta(media)
    assert(meta.schema.fieldNames.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "width", "height", "n_frames"))
    val viaExpr = media.select(col("doc_id"),
      (lit(64) + pmod(length(col("media")).cast("long"), lit(640))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    meta.collect().foreach { m =>
      assert(m.width.toLong == viaExpr(m.doc_id))
      assert(m.n_frames >= 1 && m.n_frames <= 30)
    }
  }

  test("both stages are map-side: no exchange in the plan") {
    Seq(Multimodal.decodeMeta(media).toDF(),
        Multimodal.extractFeatures(media).toDF()).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"media stages must not shuffle:\n$p")
    }
  }

  test("features: fixed dim, [-1,1], partitioning-invariant") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(m => m.doc_id -> m.features.toSeq).toMap
    val f7 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(m => m.doc_id -> m.features.toSeq).toMap
    assert(f1 == f7)
    f1.values.foreach { fs =>
      assert(fs.length == Multimodal.FeatureDim)
      fs.foreach(v => assert(v >= -1.0 && v <= 1.0))
    }
  }

  test("batching bounds memory: grouped batches see at most BatchSize rows") {
    import spark.implicits._
    // a stage identical in shape to decodeMeta, instrumented for batch size
    val maxBatch = media.as[Multimodal.MediaRow].mapPartitions { it =>
      it.grouped(Multimodal.BatchSize).map(_.size)
    }.collect().max
    assert(maxBatch <= Multimodal.BatchSize)
  }

  test("resize stage: exact byte budget, deterministic, map-side") {
    val resized = Multimodal.resizeMedia(media, 64, 64)
    val p = resized.toDF().queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"resize must not shuffle:\n$p")
    val rows = resized.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.media.length == 64 * 64 / 16))
    // deterministic + content-dependent: same input → same bytes
    val again = Multimodal.resizeMedia(media, 64, 64).collect()
      .map(r => r.doc_id -> r.media.toSeq).toMap
    rows.foreach(r => assert(again(r.doc_id) == r.media.toSeq))
    // downstream stages compose: features over resized media still typed
    val feats = Multimodal.extractFeatures(resized.toDF())
    assert(feats.head().features.length == Multimodal.FeatureDim)
  }

  test("frame sampling: deterministic evenly-spaced indices") {
    assert(Multimodal.frameSampleIndices(30, 4) == Seq(0, 7, 15, 22))
    assert(Multimodal.frameSampleIndices(2, 4) == Seq(0, 1)) // k capped at n
    assert(Multimodal.frameSampleIndices(1, 3) == Seq(0))
  }
}
