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

  test("real image decode via javax.imageio: exact dims + pixel stats, " +
      "corrupt blobs flagged not thrown, partition-invariant, map-side") {
    import spark.implicits._
    // generate real PNGs in-memory: solid-color images whose mean luma
    // is known exactly (Rec.601 of the fill color), plus one garbage
    // blob — the seam must decode the real ones and FLAG the bad one
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def luma(rgb: Int): Double =
      math.round((0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)) * 1000) / 1000.0
    val white = 0xffffff; val red = 0xff0000; val grey = 0x808080
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png(17, 9, white)),
      Multimodal.MediaRow(2L, "image", png(64, 64, red)),
      Multimodal.MediaRow(3L, "image", png(3, 200, grey)),
      Multimodal.MediaRow(4L, "image", Array[Byte](1, 2, 3, 4)))
    val df = spark.createDataset(rows).toDF()
    val got = Multimodal.decodeImageMeta(df).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).ok && got(1L).width == 17 && got(1L).height == 9 &&
      got(1L).mean_luma == luma(white))
    assert(got(2L).ok && got(2L).width == 64 && got(2L).height == 64 &&
      got(2L).mean_luma == luma(red))
    assert(got(3L).ok && got(3L).width == 3 && got(3L).height == 200 &&
      got(3L).mean_luma == luma(grey))
    assert(!got(4L).ok && got(4L).width == 0 && got(4L).n_bytes == 4,
      "garbage bytes must flag ok=false, not throw")
    // partition invariance: the stage is pure per-record
    val g7 = Multimodal.decodeImageMeta(df.repartition(7)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(g7 == got)
    // map-side: no exchange in the single-partition plan (repartition
    // above is input staging, not the stage's own shuffle)
    val p = Multimodal.decodeImageMeta(df).toDF()
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"image decode must not shuffle:\n$p")
  }

  test("real audio decode via javax.sound: exact format + RMS, " +
      "corrupt blobs flagged not thrown, partition-invariant, map-side") {
    import spark.implicits._
    // generate real WAVs in-memory: 16-bit signed PCM whose RMS is known
    // in closed form (constant DC level → RMS == |level|/32768; a
    // two-level square wave → RMS == sqrt(mean of squares)), plus one
    // garbage blob — the seam must parse the real ones and FLAG the bad
    def wav(rate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val bytes = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bytes.putShort)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes.array()), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val dc = Array.fill[Short](400)(16384)           // RMS = 0.5 exactly
    val square = Array.tabulate[Short](600)(i =>     // half ±8192, half ∓…
      if (i % 2 == 0) 8192 else -8192)               // RMS = 0.25 exactly
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav(8000f, 1, dc)),
      Multimodal.MediaRow(2L, "audio", wav(44100f, 2, square)),
      Multimodal.MediaRow(3L, "audio", Array[Byte](9, 9, 9, 9)))
    val df = spark.createDataset(rows).toDF()
    val got = Multimodal.decodeAudioMeta(df).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).ok && got(1L).sample_rate == 8000 && got(1L).channels == 1 &&
      got(1L).n_frames == 400L && got(1L).rms == 0.5)
    assert(got(2L).ok && got(2L).sample_rate == 44100 && got(2L).channels == 2 &&
      got(2L).n_frames == 300L && got(2L).rms == 0.25)
    assert(!got(3L).ok && got(3L).sample_rate == 0 && got(3L).n_bytes == 4,
      "garbage bytes must flag ok=false, not throw")
    // partition invariance: the stage is pure per-record
    val g7 = Multimodal.decodeAudioMeta(df.repartition(7)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(g7 == got)
    // map-side: no exchange in the single-partition plan
    val p = Multimodal.decodeAudioMeta(df).toDF()
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"audio decode must not shuffle:\n$p")
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
