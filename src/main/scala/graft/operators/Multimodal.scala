package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.CountMinSketchMd5

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition BATCHED
  * imperative stages — the Scala/Dataset analogue of `mapInPandas`
  * (typed `mapPartitions` + `Iterator.grouped(batchSize)` gives the same
  * batch shape an Arrow UDF would see; encoders replace the Arrow
  * schema). This is the one operator family where `mapPartitions` is the
  * right tier: a codec call per record is genuine imperative
  * per-partition logic no Catalyst expression expresses.
  *
  * The container ships no media codecs, so [[decodeStub]] /
  * [[featureStub]] are the CODEC SEAM: deterministic md5-derived
  * stand-ins with the real shapes (swap in javacv/ffmpeg bindings in a
  * real deployment — signatures, schemas, batching, and the zero-shuffle
  * plan all stay as tested here). Determinism also makes the stages
  * oracle-checkable (q75 rebuilds the features in SQL).
  *
  * Scale shape: both stages are map-side (no shuffle — plan-locked in
  * MultimodalSpec); batches bound peak memory to `batchSize` decoded
  * records per task regardless of partition size.
  */
object Multimodal {

  val FeatureDim = 8
  val BatchSize = 64

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)
  final case class MediaFeatures(doc_id: Long, kind: String, features: Array[Double])
  final case class ImageMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, mean_luma: Double, ok: Boolean)

  /** Attach the opaque media column + kind to the documents table (the
    * testdata has no real media, so the blob is the utf-8 text — same
    * convention as q53).
    */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"))

  /** CODEC SEAM #1 — "decode" a media blob to (width, height, n_frames).
    * Deterministic stand-in matching q53's metadata formulas; a real
    * build replaces the body with an image/container parser.
    */
  private[graft] def decodeStub(media: Array[Byte]): (Int, Int, Int) = {
    val n = media.length.toLong
    ((64 + (n % 640)).toInt, (64 + (n * 7 % 480)).toInt, (1 + (n % 30)).toInt)
  }

  /** CODEC SEAM #2 — "embed" a media blob into [[FeatureDim]] doubles in
    * [-1, 1]: component j = ((md5hash(j, md5hex(media)) % 2001) - 1000)
    * / 1000 — the same md5-derived convention as the LSH hyperplanes, so
    * any engine replays it.
    */
  private[graft] def featureStub(media: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(media).map("%02x".format(_)).mkString
    Array.tabulate(FeatureDim) { j =>
      ((CountMinSketchMd5.hash(j, hex) % 2001L) - 1000L) / 1000.0
    }
  }

  /** Deterministic evenly-spaced frame indices (0-based) for sampling
    * `k` of `nFrames` frames — the frame-sample stage's index math.
    */
  def frameSampleIndices(nFrames: Int, k: Int): Seq[Int] = {
    val take = math.min(k, nFrames)
    (0 until take).map(i => (i.toLong * nFrames / take).toInt)
  }

  /** CODEC SEAM #3 — "resize" a media blob to target dimensions. The
    * stand-in produces a deterministic payload of the resized byte
    * budget (truncate or cycle-pad); a real build decodes, scales, and
    * re-encodes here. Byte budget: one byte per 4×4 pixel block.
    */
  private[graft] def resizeStub(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h / 16)
    if (media.isEmpty) new Array[Byte](target)
    else Array.tabulate(target)(i => media(i % media.length))
  }

  /** Batched resize stage: binary → binary at the target dimensions,
    * map-side; kind and doc_id ride along.
    */
  def resizeMedia(media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map(r => MediaRow(r.doc_id, r.kind, resizeStub(r.media, w, h)))
      }
    }
  }

  /** Batched decode stage: binary → typed metadata, map-side. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch => // mapInPandas-style batch shape
        batch.map { r =>
          val (w, h, f) = decodeStub(r.media)
          MediaMeta(r.doc_id, r.kind, r.media.length.toLong, w, h, f)
        }
      }
    }
  }

  /** The codec seam carrying a REAL decoder: `javax.imageio` ships with
    * the JDK (PNG/BMP/GIF/JPEG readers, zero native deps), so this stage
    * decodes actual image bytes to real width/height plus a pixel
    * statistic (mean Rec.601 luma, rounded to 3 decimals) — proving the
    * batched-`mapPartitions` plumbing the stub stages test carries an
    * actual codec unchanged: same batch shape, same map-side zero-shuffle
    * plan, same encoder discipline. An un-decodable blob yields
    * `ok = false` with zeroed fields rather than a thrown task — at
    * corpus scale a corrupt image is a DATA error to filter on, not a
    * job error (one bad blob in 10¹¹ must not kill a stage). The oracle
    * queries (q53/q75) stay on the deterministic stubs — DuckDB can't
    * decode PNGs; this stage is spec-locked against generated images
    * instead ([[graft.MultimodalSpec]]).
    */
  def decodeImageMeta(media: DataFrame): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-task: keep ImageIO off its disk-backed stream cache — these
      // are in-memory byte arrays; a temp file per record is pure churn
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val bad = ImageMeta(r.doc_id, r.kind, r.media.length.toLong,
            0, 0, 0.0, ok = false)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.media))
            if (img == null) bad
            else {
              val w = img.getWidth; val h = img.getHeight
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              ImageMeta(r.doc_id, r.kind, r.media.length.toLong, w, h,
                math.round(sum / (w.toLong * h) * 1000) / 1000.0, ok = true)
            }
          } catch { case _: Exception => bad }
        }
      }
    }
  }

  final case class AudioMeta(doc_id: Long, kind: String, n_bytes: Long,
      sample_rate: Int, channels: Int, n_frames: Long, rms: Double, ok: Boolean)

  /** The codec seam carrying a REAL audio decoder — the audio leg of the
    * triad, mirroring [[decodeImageMeta]]: `javax.sound.sampled` ships
    * with the JDK (WAV/AIFF/AU readers, zero native deps), so this stage
    * parses actual audio containers to real (sample_rate, channels,
    * n_frames) plus a sample statistic (RMS amplitude of 16-bit signed
    * PCM normalized to [-1, 1], rounded to 6 decimals; non-16-bit-PCM
    * encodings report container metadata with rms = 0). Same contract as
    * the image stage: batched `mapPartitions`, map-side zero-shuffle
    * plan, and an un-decodable blob yields `ok = false` with zeroed
    * fields rather than a thrown task — a corrupt clip in 10¹¹ is a DATA
    * error to filter on, not a job error. The oracle queries (q53/q75)
    * stay on the deterministic stubs — DuckDB can't parse WAV; this
    * stage is spec-locked against generated PCM ([[graft.MultimodalSpec]]).
    */
  def decodeAudioMeta(media: DataFrame): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val bad = AudioMeta(r.doc_id, r.kind, r.media.length.toLong,
            0, 0, 0L, 0.0, ok = false)
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.media))
            try {
              val fmt = in.getFormat
              val pcm16 = fmt.getSampleSizeInBits == 16 && fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              val rms = if (!pcm16) 0.0 else {
                val bb = java.nio.ByteBuffer.wrap(in.readAllBytes()).order(
                  if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                var sum = 0.0
                var n = 0L
                while (bb.remaining() >= 2) {
                  val v = bb.getShort / 32768.0
                  sum += v * v
                  n += 1
                }
                if (n == 0L) 0.0 else math.sqrt(sum / n)
              }
              AudioMeta(r.doc_id, r.kind, r.media.length.toLong,
                fmt.getSampleRate.toInt, fmt.getChannels, in.getFrameLength,
                math.round(rms * 1e6) / 1e6, ok = true)
            } finally in.close()
          } catch { case _: Exception => bad }
        }
      }
    }
  }

  /** Batched feature-extraction stage: binary → fixed-dim embedding. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map(r => MediaFeatures(r.doc_id, r.kind, featureStub(r.media)))
      }
    }
  }
}
