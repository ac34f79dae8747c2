package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{PipelineQueries, Tables}
import graft.streaming.{DocsStream, PretrainStream}

/** ST18 family: the STREAMING twin of the composed pretrain pipeline
  * (q160/q161) — incremental ingest replayed as an id-ordered file
  * stream must reproduce the batch chain stage by stage:
  *
  *  - ST18: full-chain parity. Three mtime-ordered files (so both keyed
  *    states must carry across micro-batches), the composed query +
  *    sink, then finalization — asserted BIT-EQUAL to batch q161 (the
  *    rep-anchored stage-2 form, the stream's anchoring discipline) at
  *    every stage boundary AND the final packed output; asserted
  *    OVER-KEEP-ONLY against batch q160's pairwise stage-2 form (the
  *    ST11c contract: verified folds can under-merge, never over-merge).
  *  - ST18e: the stream's verified edge channel equals the batch
  *    `repAnchoredEdges` kernel applied to the stage-1 survivors —
  *    the edge-discipline lock that makes ST18's stage-2 parity
  *    mechanical rather than coincidental.
  */
class PretrainStreamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = TestSpark.spark

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case d: Double => math.round(d * 1e9) / 1e9
        case x => x
      })
      .toSeq.sortBy(_.mkString("|"))
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  /** Stage docs as n id-ordered single-parquet files under a temp dir. */
  private def stageOrdered(docs: DataFrame, n: Int): String = {
    val bounds = docs.stat.approxQuantile("doc_id",
      (1 to (n - 1)).map(_.toDouble / n).toArray, 0.0).map(_.toLong)
    val sd = java.nio.file.Files.createTempDirectory("pretrain-stream")
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("pretrain-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = sd.resolve(name)
      java.nio.file.Files.move(part.toPath, dest)
      require(dest.toFile.setLastModified(mtime),
        s"setLastModified rejected on $dest — ordered replay broken")
    }
    val cuts = ((Long.MinValue +: bounds) :+ Long.MaxValue).toSeq
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      stage(docs.filter(col("doc_id") > lo && col("doc_id") <= hi),
        s"f$i.parquet", 1000000L * (i + 1))
    }
    sd.toString
  }

  test("composed pretrain stream == batch q161 at every stage and the " +
      "final output; over-keep-only vs the pairwise form (ST18)") {
    val docs = Tables(spark, dir, "documents")
    val evalPred = col("doc_id") % 10 === 7
    val sd = stageOrdered(docs, 3)
    val labelsRoot = java.nio.file.Files
      .createTempDirectory("pretrain-labels").toString
    val storeRoot = java.nio.file.Files
      .createTempDirectory("pretrain-store").toString

    val sinkH = PretrainStream.sink(docs, evalPred,
      s"st18:$storeRoot", labelsRoot, storeRoot)
    val q = PretrainStream.signals(DocsStream.readStream(spark, sd), docs)
      .writeStream
      .foreachBatch((b: DataFrame, e: Long) => sinkH.fn(b, e))
      .start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    sinkH.release()
    assert(nBatches >= 3, s"expected ≥3 micro-batches, got $nBatches")

    // batch q161 (rep-anchored stage 2) with every stage captured
    val stages = scala.collection.mutable.Map[Int, DataFrame]()
    val batchOut = PipelineQueries.q160Frame(spark, dir,
      PipelineQueries.Q160Budget,
      stageRun = Some((i, _, mk) => {
        val df = mk().localCheckpoint(); stages(i) = df; df
      }),
      repAnchoredNearDup = true)

    val store = spark.read.parquet(storeRoot)
    val notEval = (s: Set[Long]) => s.filter(_ % 10 != 7)

    // stage 1: the store holds exactly the non-eval canonical survivors
    assert(ids(store) == notEval(ids(stages(1))), "stage-1 survivors differ")

    // stage 2: label-derived keep == the batch fixpoint keep-list
    val labels = DocsStream.latestLabels(spark, labelsRoot)
      .getOrElse(fail("no labels epoch written"))
    val streamKept2 = ids(store
      .join(labels.select(col("doc_id"), col("rep")), Seq("doc_id"), "left")
      .filter(col("rep").isNull || col("rep") === col("doc_id")))
    assert(streamKept2 == notEval(ids(stages(2))), "stage-2 keep-list differs")

    // stage 3: decontaminated survivors
    val sig3 = PretrainStream.storeSig3(spark, storeRoot, labelsRoot)
    assert(ids(sig3) == ids(stages(3)), "stage-3 survivors differ")
    // decontamination must actually drop something here, or this stage
    // locks nothing
    assert(ids(sig3).size < streamKept2.size,
      "decontamination dropped nothing — stage untested")

    // stage 4: the gated signal frame, full rows
    assert(sortedRows(PipelineQueries.q160GateFrom(sig3)) ==
      sortedRows(stages(4)), "stage-4 gate output differs")

    // the full packed output, bit-for-bit
    val streamOut = PretrainStream.q160Output(spark, storeRoot, labelsRoot,
      PipelineQueries.Q160Budget)
    assert(streamOut.count() > 0, "empty final output")
    assert(sortedRows(streamOut) == sortedRows(batchOut),
      "final packed output differs from batch q161")

    // against the PAIRWISE stage-2 form (q160): over-keep only — every
    // pairwise survivor is a stream survivor
    val stagesP = scala.collection.mutable.Map[Int, DataFrame]()
    // stage construction (and the stagesP captures) happen eagerly in
    // the call; the returned tail frame itself is not needed
    PipelineQueries.q160Frame(spark, dir, PipelineQueries.Q160Budget,
      stageRun = Some((i, _, mk) => {
        val df = mk().localCheckpoint(); stagesP(i) = df; df
      }))
    val pairwiseS2 = notEval(ids(stagesP(2)))
    assert((pairwiseS2 -- streamKept2).isEmpty,
      s"stream UNDER-kept vs pairwise: ${(pairwiseS2 -- streamKept2).take(5)}")
  }

  test("null-text docs flow as ineligible markers instead of killing " +
      "the query (ST18n)") {
    // docsSchema declares text nullable and the batch chain tolerates
    // null texts (null canonical class, coalesce'd ckey); the typed
    // encoder in signals() has primitive fields, so without the
    // null-coalescing this crashed the whole query
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha beta gamma delta", "en", "web", 22L),
        Row(2L, null, "en", "web", 0L),
        Row(3L, "alpha beta gamma delta", "en", "web", 22L)), 1),
      schema)
    val sd = java.nio.file.Files.createTempDirectory("pretrain-null")
    docs.coalesce(1).write.mode("overwrite").parquet(sd.toString)
    val q = PretrainStream.signals(DocsStream.readStream(spark, sd.toString),
        docs)
      .writeStream.format("memory").queryName("st18n_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    val out = spark.table("st18n_out")
    val markers = out.filter(col("kind") === 0)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 3 is an exact duplicate of doc 1 (dropped at stage 1); the
    // null-text doc 2 survives as a 0-token ineligible marker
    assert(markers.keySet == Set(1L, 2L), s"markers: $markers")
    assert(markers(2L) == 0L, "null-text doc should carry n_tokens 0")
    assert(out.filter(col("kind") === 1).count() == 0, "no edges expected")
  }

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withStateStore[T](provider: Option[String])(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    provider.foreach(spark.conf.set(key, _))
    try body finally provider.foreach(_ => spark.conf.unset(key))
  }

  /** ST18e body, parameterized on the state-store provider: the chained
    * TWO-state query's handlers round-trip their state (a Long per
    * canonical class; (Long, Seq[Long]) per bucket) through the store,
    * so a provider-specific encoder defect would break edge/marker
    * parity here.
    */
  private def edgeChannelCase(provider: Option[String], tag: String): Unit = {
    val docs = Tables(spark, dir, "documents")
    val sd = stageOrdered(docs, 3)
    val q = withStateStore(provider) {
      PretrainStream.signals(DocsStream.readStream(spark, sd), docs)
        .writeStream.format("memory").queryName(s"st18e_out_$tag")
        .outputMode("append").start()
    }
    q.processAllAvailable()
    q.stop()
    val out = spark.table(s"st18e_out_$tag")
    val streamEdges = out.filter(col("kind") === 1)
      .select(col("doc_id"), col("dup_of")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val canon = trim(regexp_replace(lower(
      graft.functions.TextFunctions.nfcNormalize(col("text"))), "\\s+", " "))
    val s1 = docs.select(col("doc_id"), canon.as("c"))
      .groupBy(col("c")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val d1 = docs.join(s1, Seq("doc_id"), "left_semi")
    val expected = PipelineQueries.repAnchoredEdgesOf(d1)
      .filter(col("src") > col("dst"))
      .select(col("src"), col("dst")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "no rep-anchored edges in testdata?")
    assert(streamEdges == expected,
      s"edge channel diverged: stream-only=${(streamEdges -- expected).take(5)} " +
        s"batch-only=${(expected -- streamEdges).take(5)}")

    // the marker channel covers every canonical survivor exactly once
    val markers = out.filter(col("kind") === 0).select(col("doc_id"))
    assert(markers.count() == markers.distinct().count(),
      "duplicate doc markers")
    assert(ids(markers) == ids(s1), "marker channel != stage-1 survivors")
  }

  test("composed-stream TTL: both keyed states expire and re-admit " +
      "(ST18t)") {
    // dedup-within-horizon for the COMPOSED stream: after ttlMs of
    // quiescence BOTH states (canonical-class ledger and bucket reps)
    // expire, so a re-arriving exact copy is RE-ADMITTED as a stage-1
    // survivor and becomes its bucket's new rep (no edge to the expired
    // one); in-horizon behavior is unchanged (its near-dup still edges
    // to it). Same engine discipline as ST12: ProcessingTimeTimeout
    // needs the periodic no-data batches, so progress is polled by
    // per-batch row counts under a throttled trigger.
    import org.apache.spark.sql.streaming.Trigger
    val sparkS = spark
    import sparkS.implicits._
    val docs = Tables(spark, dir, "documents")
    // a verified near-dup pair with DISTINCT canonical texts from the
    // testdata (band-cohabiting and Jaccard >= 0.5 by construction)
    val canonOf = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(lower(
        graft.functions.TextFunctions.nfcNormalize(c)), "\\s+", " "))
    val pick = DocsStream.nearDupVerifiedBatch(docs, docs)
      .filter(col("jaccard") < 1.0)
      .join(docs.select(col("doc_id"), col("text").as("text_a")), "doc_id")
      .join(docs.select(col("doc_id").as("dup_of"),
        col("text").as("text_b")), "dup_of")
      .filter(canonOf(col("text_a")) =!= canonOf(col("text_b")))
      .orderBy(col("doc_id"), col("dup_of"))
      .select(col("text_a"), col("text_b")).head()
    val (tVar, tRep) = (pick.getString(0), pick.getString(1))

    def frame(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val history = frame(1L -> tRep, 2L -> tRep, 4L -> tVar)
    val sd = java.nio.file.Files.createTempDirectory("pretrain-ttl")
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("pretrain-ttl-w")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = sd.resolve(name)
      java.nio.file.Files.move(part.toPath, dest)
      require(dest.toFile.setLastModified(mtime), s"mtime rejected: $dest")
    }
    val ttlMs = 2000L
    stage(frame(1L -> tRep), "a.parquet", 1000000L)
    val q = PretrainStream
      .signals(DocsStream.readStream(spark, sd.toString), history, ttlMs)
      .writeStream.format("memory").queryName("st18t_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .outputMode("append").start()
    def waitForBatchWithRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (!q.recentProgress.exists(_.numInputRows == n)) {
        assert(System.currentTimeMillis < deadline,
          s"timed out waiting for a $n-row micro-batch; progress=" +
            q.recentProgress.map(_.numInputRows).mkString(","))
        Thread.sleep(100)
      }
    }
    waitForBatchWithRows(1)
    // wait until BOTH stores actually expired (state rows drop to 0 in a
    // committed no-data batch) before staging the second file — a fixed
    // sleep races the 1 s trigger on a loaded box (the timeout batch can
    // fire late, doc 2 arrives before expiry, and edges gain 2->1)
    locally {
      val deadline = System.currentTimeMillis + 60000
      def drained = Option(q.lastProgress).exists(p =>
        p.stateOperators.nonEmpty &&
          p.stateOperators.forall(_.numRowsTotal == 0))
      while (!drained) {
        assert(System.currentTimeMillis < deadline,
          s"timed out waiting for state expiry; lastProgress=" +
            Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal)
              .mkString(",")).getOrElse("none"))
        Thread.sleep(100)
      }
    }
    stage(frame(2L -> tRep, 4L -> tVar), "c.parquet", 3000000L)
    waitForBatchWithRows(2)
    q.stop()
    val out = spark.table("st18t_out")
    val markers = ids(out.filter(col("kind") === 0))
    val edges = out.filter(col("kind") === 1)
      .select(col("doc_id"), col("dup_of")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 (exact copy of 1) is re-admitted by the expired canonical
    // ledger AND becomes the bucket rep (no edge to the expired 1);
    // doc 4 (in-horizon near-dup) edges to 2, never to 1
    assert(markers == Set(1L, 2L, 4L), s"markers: $markers")
    assert(edges == Set(4L -> 2L), s"edges: $edges")
  }

  test("a survivor missing from the corpus table is QUARANTINED, not " +
      "passed as decontaminated (ST18q)") {
    // continuous-ingest race: the stream can run ahead of the corpus
    // table, so the sink's text re-attachment LEFT join finds nothing —
    // before the quarantine flag such a doc generated no grams, landed
    // contaminated=false (bypassing the safety stage), and collapsed
    // its split key to md5("split|"). Now it must land quarantined,
    // be excluded from sig3/finalization, and be surfaced.
    val sparkS = spark
    import sparkS.implicits._
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten"
    def frame(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val streamed = frame(1L -> tA, 2L -> tB)
    val history = frame(1L -> tA) // doc 2 not yet in the corpus table
    val sd = java.nio.file.Files.createTempDirectory("pretrain-quarantine")
    streamed.coalesce(1).write.mode("overwrite").parquet(sd.toString)
    val labelsRoot = java.nio.file.Files
      .createTempDirectory("pretrain-q-labels").toString
    val storeRoot = java.nio.file.Files
      .createTempDirectory("pretrain-q-store").toString
    val sinkH = PretrainStream.sink(history, col("doc_id") % 10 === 7,
      s"st18q:$storeRoot", labelsRoot, storeRoot)
    val q = PretrainStream
      .signals(DocsStream.readStream(spark, sd.toString), history)
      .writeStream
      .foreachBatch((b: DataFrame, e: Long) => sinkH.fn(b, e))
      .start()
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    sinkH.release()
    val store = spark.read.parquet(storeRoot)
    val byId = store.select(col("doc_id"), col("quarantined"),
        col("contaminated")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(byId.keySet == Set(1L, 2L), s"store rows: $byId")
    assert(byId(1L) == ((false, false)), "in-table doc wrongly flagged")
    assert(byId(2L) == ((true, false)),
      s"missing-text doc must be quarantined: ${byId(2L)}")
    val sig3Ids = ids(PretrainStream.storeSig3(spark, storeRoot, labelsRoot))
    assert(sig3Ids == Set(1L),
      s"quarantined doc leaked into sig3: $sig3Ids")
    val quar = ids(PretrainStream.storeQuarantined(spark, storeRoot))
    assert(quar == Set(2L), s"quarantine surface: $quar")
  }

  test("composed-stream EVENT-TIME TTL: both states expire on the " +
      "watermark clock and re-admit; in-horizon dedup holds (ST18te)") {
    // the ST18t dual-horizon law, driven by EVENT timestamps instead of
    // wall clock: a historical backfill replayed fast must expire by
    // the data's own clock (ProcessingTimeTimeout would expire nothing
    // — wall time barely advances between files). No sleeps anywhere:
    // expiry is forced by a watermark-driving filler doc and observed
    // by polling state rows down to exactly the filler's residue.
    val sparkS = spark
    import sparkS.implicits._
    val docs = Tables(spark, dir, "documents")
    val canonOf = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(lower(
        graft.functions.TextFunctions.nfcNormalize(c)), "\\s+", " "))
    val pick = DocsStream.nearDupVerifiedBatch(docs, docs)
      .filter(col("jaccard") < 1.0)
      .join(docs.select(col("doc_id"), col("text").as("text_a")), "doc_id")
      .join(docs.select(col("doc_id").as("dup_of"),
        col("text").as("text_b")), "dup_of")
      .filter(canonOf(col("text_a")) =!= canonOf(col("text_b")))
      .orderBy(col("doc_id"), col("dup_of"))
      .select(col("text_a"), col("text_b")).head()
    val (tVar, tRep) = (pick.getString(0), pick.getString(1))

    val ttlMs = 60000L // one MINUTE of event time — wall clock irrelevant
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(baseMs: Long, plusMs: Long) = new java.sql.Timestamp(baseMs + plusMs)
    def frame(rows: (Long, String, java.sql.Timestamp)*) = rows.toSeq
      .map { case (id, t, ts) => (id, t, "en", "src", t.length.toLong, ts) }
      .toDF("doc_id", "text", "lang", "source", "n_chars", "ts")
    // filler doc 9: <3 tokens → solo bucket (no bucket state), distinct
    // canonical class — its only job is raising the watermark past
    // doc 1's horizon; its own class state stays live (1 residual row)
    val filler = "wm driver"
    val tsB = at(t0.getTime, ttlMs + 540000L) // 10 min past t0
    val history = frame((1L, tRep, t0), (2L, tRep, at(tsB.getTime, 1000L)),
      (4L, tVar, at(tsB.getTime, 1000L)), (9L, filler, tsB))
    val sd = java.nio.file.Files.createTempDirectory("pretrain-ette")
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("pretrain-ette-w")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = sd.resolve(name)
      java.nio.file.Files.move(part.toPath, dest)
      require(dest.toFile.setLastModified(mtime), s"mtime rejected: $dest")
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING, lang STRING, source STRING, " +
        "n_chars LONG, ts TIMESTAMP")
    stage(frame((1L, tRep, t0)), "a.parquet", 1000000L)
    stage(frame((9L, filler, tsB)), "b.parquet", 2000000L)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(sd.toString)
    // chained event-time keyed states trip the engine's global-watermark
    // heuristic; the signals() scaladoc proves the emission discipline
    // safe (stage-1 outputs carry same-batch timestamps), so the
    // documented opt-out applies — scoped to this query's start
    val ccKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(ccKey, "false")
    val q = try PretrainStream
      .signals(stream, history, ttlMs, eventTimeCol = Some("ts"))
      .writeStream.format("memory").queryName("st18te_out")
      .outputMode("append").start()
    finally spark.conf.unset(ccKey)
    // wait for doc 1's class + bucket states to EXPIRE on the event
    // clock: after file b's batch the watermark reads tsB, the engine
    // runs the watermark-advance batch, and state collapses to exactly
    // doc 9's one residual class row (its horizon is still open)
    locally {
      val deadline = System.currentTimeMillis + 60000
      def residue = Option(q.lastProgress).map(p =>
        p.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      while (residue != 1L) {
        assert(System.currentTimeMillis < deadline,
          s"timed out waiting for event-time expiry; state rows=$residue")
        Thread.sleep(100)
      }
    }
    stage(frame((2L, tRep, at(tsB.getTime, 1000L)),
      (4L, tVar, at(tsB.getTime, 1000L))), "c.parquet", 3000000L)
    locally {
      val deadline = System.currentTimeMillis + 60000
      while (!q.recentProgress.exists(_.numInputRows == 2)) {
        assert(System.currentTimeMillis < deadline,
          "timed out waiting for the 2-row micro-batch")
        Thread.sleep(100)
      }
    }
    q.processAllAvailable()
    q.stop()
    val out = spark.table("st18te_out")
    val markers = ids(out.filter(col("kind") === 0))
    val edges = out.filter(col("kind") === 1)
      .select(col("doc_id"), col("dup_of")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 (exact copy of 1, one event-minute later) re-admitted by the
    // expired class ledger AND the new bucket rep (no edge to 1); doc 4
    // (in-horizon near-dup) edges to 2, never to 1
    assert(markers == Set(1L, 2L, 4L, 9L), s"markers: $markers")
    assert(edges == Set(4L -> 2L), s"edges: $edges")
  }

  test("stream verified-edge channel == batch repAnchoredEdges over " +
      "stage-1 survivors (ST18e)") {
    edgeChannelCase(None, "hdfs")
  }

  test("quarantined rows are RE-DRIVEN through the sink law once the " +
      "table catches up; finalization == the never-raced run (ST18rq)") {
    // the quarantine channel's missing half: surfacing stream-ahead-of-
    // table survivors is useless if re-admitting them is manual surgery.
    // redriveQuarantined must re-run decontamination + store upsert for
    // exactly those rows, clear the flag, and leave the store
    // indistinguishable from a run where the table never lagged.
    val sparkS = spark
    import sparkS.implicits._
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten"
    def frame(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val streamed = frame(1L -> tA, 2L -> tB)
    val evalPred = col("doc_id") % 10 === 7
    def run(history: DataFrame, tag: String): (String, String) = {
      val sd = java.nio.file.Files.createTempDirectory(s"redrive-$tag")
      streamed.coalesce(1).write.mode("overwrite").parquet(sd.toString)
      val labelsRoot = java.nio.file.Files
        .createTempDirectory(s"redrive-$tag-labels").toString
      val storeRoot = java.nio.file.Files
        .createTempDirectory(s"redrive-$tag-store").toString
      val sinkH = PretrainStream.sink(history, evalPred,
        s"st18rq:$tag:$storeRoot", labelsRoot, storeRoot)
      val q = PretrainStream
        .signals(DocsStream.readStream(spark, sd.toString), history)
        .writeStream
        .foreachBatch((b: DataFrame, e: Long) => sinkH.fn(b, e))
        .start()
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      q.stop()
      sinkH.release()
      (storeRoot, labelsRoot)
    }
    // RACED: doc 2 missing from the table at sink time → quarantined
    val (storeR, labelsR) = run(frame(1L -> tA), "raced")
    assert(ids(PretrainStream.storeQuarantined(spark, storeR)) == Set(2L),
      "precondition: doc 2 must start quarantined")
    // the table catches up; re-drive through the SAME sink law
    val caughtUp = frame(1L -> tA, 2L -> tB)
    val n = PretrainStream.redriveQuarantined(spark, caughtUp, evalPred,
      s"st18rq:catchup:$storeR", storeR)
    assert(n == 1L, s"expected 1 re-driven row, got $n")
    assert(ids(PretrainStream.storeQuarantined(spark, storeR)).isEmpty,
      "flag not cleared by re-drive")
    assert(ids(PretrainStream.storeSig3(spark, storeR, labelsR)) ==
      Set(1L, 2L), "re-driven doc missing from sig3")
    // a second re-drive is a no-op (idempotent, like the sink's epochs)
    assert(PretrainStream.redriveQuarantined(spark, caughtUp, evalPred,
      s"st18rq:catchup:$storeR", storeR) == 0L)
    // NEVER-RACED twin: the table had both docs from the start —
    // store contents and finalization must match bit-for-bit
    val (storeN, labelsN) = run(caughtUp, "neverraced")
    assert(sortedRows(spark.read.parquet(storeR).drop("epoch")) ==
      sortedRows(spark.read.parquet(storeN).drop("epoch")),
      "re-driven store != never-raced store")
    assert(sortedRows(PretrainStream.q160Output(spark, storeR, labelsR,
        PipelineQueries.Q160Budget)) ==
      sortedRows(PretrainStream.q160Output(spark, storeN, labelsN,
        PipelineQueries.Q160Budget)),
      "finalization differs from the never-raced run")
    // crash-recovery law: the swap's move-aside is the only copy of an
    // epoch if the crash hit between the two renames — the next call's
    // recovery sweep must restore it before doing anything else
    val fs = new org.apache.hadoop.fs.Path(storeR)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = sortedRows(spark.read.parquet(storeR).drop("epoch"))
    val anEpoch = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$storeR/epoch=*")).head.getPath
    val aside = new org.apache.hadoop.fs.Path(storeR,
      ".redrive_old_" + anEpoch.getName)
    assert(fs.rename(anEpoch, aside), "crash simulation rename failed")
    assert(PretrainStream.redriveQuarantined(spark, caughtUp, evalPred,
      s"st18rq:catchup:$storeR", storeR) == 0L)
    assert(fs.exists(anEpoch) && !fs.exists(aside),
      "recovery sweep did not restore the moved-aside epoch")
    assert(sortedRows(spark.read.parquet(storeR).drop("epoch")) == before,
      "store content changed across crash recovery")
  }

  test("a store MIXING pre- and post-quarantine epochs reads both " +
      "correctly: old rows are clean, new flags are honored (ST18m)") {
    // schema drift across epochs: without mergeSchema the reader takes
    // one file's schema by lottery — either new epochs' quarantined rows
    // leak into sig3 as clean, or every pre-upgrade row reads
    // quarantined=null and is silently dropped. Both are wrong answers
    // in the safety stage.
    val sparkS = spark
    import sparkS.implicits._
    val storeRoot = java.nio.file.Files
      .createTempDirectory("mixed-store").toString
    val labelsRoot = java.nio.file.Files
      .createTempDirectory("mixed-labels").toString // empty: no labeling
    def row(id: Long) = (id, "src", 10L, 0.9, s"ck$id", s"o$id", false)
    // epoch 0: PRE-upgrade schema (no quarantined column)
    Seq(row(1L), row(2L))
      .toDF("doc_id", "source", "n_tokens", "ttr", "ckey", "ord",
        "contaminated")
      .write.parquet(s"$storeRoot/epoch=0")
    // epoch 1: post-upgrade schema, one quarantined row
    Seq((3L, "src", 10L, 0.9, false, "ck3", "o3", false),
        (4L, "src", 10L, 0.9, true, "ck4", "o4", false))
      .toDF("doc_id", "source", "n_tokens", "ttr", "quarantined", "ckey",
        "ord", "contaminated")
      .write.parquet(s"$storeRoot/epoch=1")
    val sig3 = ids(PretrainStream.storeSig3(spark, storeRoot, labelsRoot))
    assert(sig3 == Set(1L, 2L, 3L),
      s"mixed-schema sig3 wrong (old rows dropped or flag ignored): $sig3")
    val quar = ids(PretrainStream.storeQuarantined(spark, storeRoot))
    assert(quar == Set(4L), s"mixed-schema quarantine surface wrong: $quar")
  }

  test("ST18e parity holds under the RocksDB state store (ST18er)") {
    edgeChannelCase(Some(RocksDb), "rocksdb")
  }
}
