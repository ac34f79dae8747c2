package graft

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Pins the EXPECTED codegen fallback so it can't hide a real one. The
  * deliberately-inline large-k PQ literal forms overflow Janino's
  * 64 KB method limit when whole-stage fusion collapses them into one
  * generated method (their boundary specs assert bit-parity against
  * the data-driven twins after the interpreted fallback) — that
  * makes "ERROR CodeGenerator … Code grows beyond 64 KB" FAMILIAR noise
  * in suite logs, which is exactly where an unrelated codegen
  * regression would hide. This spec captures the CodeGenerator log
  * channel and asserts both directions: the inline form DOES fall back
  * (if it stops overflowing, the boundary specs are no longer
  * exercising the fallback path and should be revisited), and the
  * product search path (stored-code LUT ADC) compiles CLEAN (a 64 KB
  * overflow appearing there is a performance regression, not noise).
  */
class CodegenFallbackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def embs = graft.queries.Tables(spark, dir, "embeddings")

  private final class Capture extends AbstractAppender(
      "graft-codegen-capture", null, null, true, Property.EMPTY_ARRAY) {
    val hits = new java.util.concurrent.atomic.AtomicInteger
    override def append(e: LogEvent): Unit = {
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + "|" + chain(t.getCause)
      val s = e.getMessage.getFormattedMessage + chain(e.getThrown)
      if (s.contains("grows beyond 64 KB")) { hits.incrementAndGet(); () }
    }
  }

  /** Run `body` with a root-logger capture of 64 KB-overflow events
    * (compile failures are not cached, so every attempt re-logs —
    * local-mode executors share this JVM's logging context).
    */
  private def overflowsDuring[T](body: => T): Int = {
    val ctx = LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val app = new Capture
    app.start()
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(app, null, null)
    ctx.updateLoggers()
    try { body; app.hits.get }
    finally {
      root.removeAppender(app.getName); ctx.updateLoggers(); app.stop()
    }
  }

  test("inline encode fusion falls back (expected); stored-code LUT ADC " +
      "compiles clean — the familiar-noise boundary is pinned both ways") {
    val books = Pq.train(embs, rounds = 1)
    val qv = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    // encode OUTSIDE the clean window (its own compile is not under
    // test) and pin it, so the clean run drives only the search path
    val enc = Pq.encode(embs, books).localCheckpoint()

    // the known-overflowing shape is the FUSED whole-stage pipeline
    // (encode's M×K literal chains + the per-subspace range filter +
    // count collapse into one generated method — encode alone compiles,
    // the fusion does not): exactly PqSpec's range-check query
    val cols = (0 until Pq.M).map(m => col(s"c$m"))
    val inlineOverflows = overflowsDuring {
      Pq.encode(embs, books)
        .filter(cols.map(c => c < 0 || c >= Pq.K).reduce(_ || _)).count()
    }
    assert(inlineOverflows > 0,
      "the deliberately-inline encode+filter fusion no longer overflows " +
        "64 KB — the boundary specs are not exercising the interpreted " +
        "fallback anymore; revisit them (and this pin)")

    val lut = Pq.adcLut(qv, books)
    val cleanOverflows = overflowsDuring {
      enc.select(col("vec_id"), Pq.adcFromCodes(m => col(s"c$m"), lut))
        .write.format("noop").mode("overwrite").save()
    }
    assert(cleanOverflows == 0,
      s"$cleanOverflows 64 KB overflows on the PRODUCT search path — " +
        "this is a real codegen regression, not the familiar noise")
  }
}
