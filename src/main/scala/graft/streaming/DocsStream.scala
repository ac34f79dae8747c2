package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

import graft.operators.TextOps

/** Streaming near-duplicate detection over a document stream — the
  * continuous-ingest form of q43's MinHash banding. Signatures and band
  * keys are computed MAP-SIDE on each micro-batch (same md5-derived
  * kernel as the batch path, so batch and stream agree bit-for-bit);
  * keyed state per (band, bucket) holds only the minimum doc_id seen, so
  * a bucket's state is ONE long no matter how many docs hash into it.
  *
  * Scale shape: the only shuffle per micro-batch is the state-store
  * partitioning on (band, bucket) — high-cardinality keys, same
  * distribution argument as batch banding. State is bounded by bucket
  * cardinality, not corpus size, and the `ttlMs` option bounds the
  * horizon (dedup-within-N-days): an idle bucket's state expires via
  * processing-time timeout and its next doc is re-admitted as the new
  * representative, so state tracks the horizon's churn, not the
  * stream's lifetime.
  *
  * Ordering contract: candidates match the batch twin EXACTLY when
  * doc_ids arrive in increasing order (the natural ingest order — ids
  * are assigned at ingest). Within a micro-batch the handler sorts, so
  * only CROSS-batch regressions of id order can perturb emissions —
  * and under those, [[nearDupCandidates]] emits a rep-relink edge when
  * a later batch displaces a bucket's stored rep with a smaller id, so
  * the edge set's CONNECTED COMPONENTS (what the incremental labeling
  * consumes) equal the batch twin's under ANY arrival order; only the
  * edge orientation/multiplicity can differ. Spec-locked both ways:
  * ordered staging (bit-parity) and reversed staging (label parity).
  */
object DocsStream {

  val docsSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")

  /** File-source stream over a directory of documents parquet. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir)

  /** q43's 4×2-hash banding plus the doc's sorted shingle-hash set (the
    * q72 verification kernel's input — see
    * [[graft.functions.ShingleHashSet]] for the 56-bit parity contract):
    * (doc_id, band, bkey, shset). All map-side.
    */
  private def banded(docs: DataFrame): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    // native fused signature/shingle-set kernels (graft.functions.
    // {MinHashSig, ShingleHashSet}) — bit-identical to the HOF kernels,
    // so stream/batch parity with the query pack is preserved by
    // construction
    val sig = graft.functions.TextFunctions.minhashSigNative(col("text"), 8)
    def mh(j: Int) = element_at(col("sig"), j + 1)
    val bands = (0 until 4).map(b => struct(lit(b).as("band"),
      concat_ws("_", mh(2 * b), mh(2 * b + 1)).as("bkey")))
    docs.filter(size(ws) >= 3)
      .select(col("doc_id"),
        graft.functions.SetFunctions.shingleHashSet(col("text"), 3).as("shset"),
        sig.as("sig"))
      .select(col("doc_id"), col("shset"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"), col("shset"))
  }

  /** q43's 4×2-hash banding, map-side: (doc_id, band, bkey). */
  def bandKeys(docs: DataFrame): DataFrame =
    banded(docs).select(col("doc_id"), col("band"), col("bkey"))

  /** The q72 exact-Jaccard verification, shared by the streaming and
    * batch candidate paths: each (doc_id, band, dup_of, shset) candidate
    * is checked against its bucket representative's shingle set at
    * Jaccard ≥ 0.5. The representative lookup is an equi-join on the
    * rep id against `history` (the corpus table a production deployment
    * keeps anyway) — per micro-batch that is a hash join whose stream
    * side is only the candidate set; the Jaccard itself is a map-side
    * array expression.
    */
  private def verifyAgainstReps(cand: DataFrame, history: DataFrame): DataFrame = {
    val hw = TextOps.tokens(col("text"))
    val reps = history.filter(size(hw) >= 3)
      .select(col("doc_id").as("dup_of"),
        graft.functions.SetFunctions.shingleHashSet(col("text"), 3).as("rep_sh"))
    cand.join(reps, "dup_of")
      .select(col("doc_id"), col("band"), col("dup_of"),
        graft.functions.SetFunctions.jaccardSorted(
          col("shset"), col("rep_sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  private def timeoutConf(ttlMs: Long): GroupStateTimeout =
    if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Streaming candidate emission: each doc whose (band, bucket) has an
    * earlier doc emits (doc_id, band, dup_of = the bucket's minimum).
    * Works on batch frames too, but the batch path should prefer
    * [[nearDupCandidatesBatch]] (a plain aggregation — no state store).
    *
    * `ttlMs > 0` bounds the dedup horizon: a (band, bucket) whose state
    * goes `ttlMs` without new arrivals is dropped at the next trigger
    * (processing-time timeout), so state size is bounded by the horizon's
    * bucket churn, not the stream's lifetime. After expiry the bucket's
    * next doc is RE-ADMITTED as its new representative —
    * dedup-within-horizon, the production near-dup contract. Inside the
    * horizon, emission semantics are unchanged (batch parity holds).
    */
  def nearDupCandidates(docs: DataFrame, ttlMs: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs)
      .select(col("band"), col("bkey"), col("doc_id"))
      .as[(Int, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, timeoutConf(ttlMs)) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // sort within the batch: emission semantics are "min of all
            // earlier ids", independent of partition iteration order
            val ids = rows.map(_._3).toArray.sorted
            var minSeen = state.getOption.getOrElse(Long.MaxValue)
            val out = Array.newBuilder[(Long, Int, Long)]
            ids.foreach { id =>
              if (minSeen < id) out += ((id, band, minSeen))
              else if (id < minSeen) {
                // a smaller id DISPLACES the stored rep: link old rep →
                // new rep, or every doc anchored to the old rep silently
                // disconnects from docs anchored to the new one. Under
                // id-ordered arrival this never fires (bit-parity with
                // the batch twin unchanged); out-of-order arrival —
                // unsorted crawl splits, the normal production case —
                // is exactly what the 10× labels stress caught.
                if (minSeen != Long.MaxValue) out += ((minSeen, band, id))
                minSeen = id
              }
            }
            state.update(minSeen)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
      .toDF("doc_id", "band", "dup_of")
  }

  /** Batch twin of [[nearDupCandidates]]: bucket representative = min
    * doc_id, every later doc in the bucket is a candidate against it.
    */
  def nearDupCandidatesBatch(docs: DataFrame): DataFrame = {
    val bk = bandKeys(docs)
    val reps = bk.groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("dup_of"))
    bk.join(reps, Seq("band", "bkey"))
      .filter(col("dup_of") < col("doc_id"))
      .select(col("doc_id"), col("band"), col("dup_of"))
  }

  /** Displaced-rep emissions from [[nearDupVerified]]: out-of-order
    * arrivals where a smaller id displaced a bucket's stored rep and the
    * (old rep, new rep) pair was emitted through the rep-shingle cache.
    * Counted per SparkContext (the [[graft.streaming.EventsStream]]
    * `anchorRewinds` discipline) so the out-of-order regime — formerly a
    * silent bounded over-keep — is observable in any run's readout.
    */
  private val displacedAccs = new AppAccRegistry("docsstream.displaced_rep")
  def displacedReps(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    displacedAccs.get(spark)

  /** Displaced-rep emissions that PASSED in-handler verification — each
    * one folds the old rep's cluster into the new rep's, which is the
    * OVER-CONNECTION channel of the documented rep-anchoring boundary
    * (the stream anchors at the rep current on arrival, the batch twin
    * at the final minimum; a verified relink can merge what batch keeps
    * apart — over-keep only, since the link itself is exact-Jaccard
    * verified). Counting them makes the over-connection RATE observable
    * at stress scale (ST11 contract: every folded edge is an
    * individually verified pair; this bounds how many merges the
    * anchoring difference can contribute).
    */
  private val overConnectAccs = new AppAccRegistry("docsstream.overconnect_merge")
  def overConnectMerges(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    overConnectAccs.get(spark)

  /** Applications with live accumulator entries across this object's
    * registries — the lifecycle observable [[PhaseStatsCycle]] asserts
    * returns to zero when a cycled session stops. */
  private[graft] def trackedAccApps: Int =
    math.max(displacedAccs.trackedCount, overConnectAccs.trackedCount)

  /** [[nearDupCandidates]] extended through VERIFICATION: candidates are
    * exact-Jaccard-checked (≥ 0.5) against their bucket representative,
    * so the stream emits confirmed near-dups, not just bucket
    * collisions. Each arriving doc's shingle set rides THROUGH the state
    * handler as a passenger column; per-(band, bucket) state is the rep
    * id plus the REP's shingle set (the rep-shingle cache) — still
    * bounded by bucket cardinality, one array per ACTIVE bucket rather
    * than one per doc, and TTL'd away with the bucket like everything
    * else. The verification side's rep shingles come from the `history`
    * corpus table via a stream-static equi-join (candidates-sized per
    * micro-batch).
    *
    * Out-of-order arrival: when a later batch displaces a bucket's rep
    * with a smaller id, the (old rep, new rep) pair IS emitted and
    * verified IN THE HANDLER — both shingle sets are in hand (the old
    * rep's from the cache, the new rep's on the arriving row), so the
    * link holds even when `history` lags the stream and the new rep
    * isn't joinable yet — and the keep-list consumer sees the link that
    * used to be silently dropped (the r12 documented over-keep
    * boundary, now closed). Each displacement is
    * counted in [[displacedReps]]. Residual boundary (documented, not a
    * regression): verification is rep-anchored on BOTH paths, but the
    * stream anchors each doc at the rep current on arrival while the
    * batch twin anchors at the final minimum — on threshold-MARGINAL
    * chains the two can diverge in either direction (a doc verified
    * against the old rep rides a verified relink into the new rep's
    * cluster, or a failed relink splits what batch joined); every
    * emitted edge is individually Jaccard-verified either way. For
    * clusters whose members pairwise clear the threshold (the clone
    * regime) labels equal the batch twin's under ANY arrival order —
    * spec-locked (ST11d) and measured at the 10× corpus
    * (STREAM_STRESS_VERIFIED: 50k docs replayed id-descending, 1007
    * displacements, 0 missing labels, 1 extra transitively-verified
    * link). Consumers building cluster LABELS may also consume
    * [[nearDupCandidates]] (connectivity-exact under any order).
    */
  /** Exact Jaccard of two SORTED distinct shingle-hash arrays — the
    * Scala twin of `SortedSetOps.jaccard` for in-handler use (the
    * displaced pair is verified inside the state handler, where both
    * sets are in hand). Hashes are 56-bit unsigned in a Long, so the
    * signed merge compare is order-correct. Both-empty yields 0.0
    * (the expression form yields null; both fall to the ≥ τ filter).
    */
  private[graft] def jaccardSortedSeq(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def nearDupVerified(stream: DataFrame, history: DataFrame,
      ttlMs: Long = 0L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val displaced = displacedReps(spark)
    val overConnect = overConnectMerges(spark)
    // 5th field: the displaced pair's IN-HANDLER jaccard (−1 marks a
    // normal candidate, verified downstream against history). One
    // linear plan — a filter-and-union split would duplicate the
    // stateful operator and its store.
    val cand = banded(stream)
      .select(col("band"), col("bkey"), col("doc_id"), col("shset"))
      .as[(Int, String, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Int, Long, Seq[Long], Double)](
        OutputMode.Append, timeoutConf(ttlMs)) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // same emission semantics as nearDupCandidates; the arriving
            // doc's shingle set is carried on each emitted row, and the
            // BUCKET REP's set is cached in state so a displacement can
            // emit the (old rep, new rep) pair verified on the spot
            val arr = rows.toArray.sortBy(_._3)
            var (minSeen, repSh) = state.getOption
              .getOrElse((Long.MaxValue, Seq.empty[Long]))
            val out = Array.newBuilder[(Long, Int, Long, Seq[Long], Double)]
            arr.foreach { r =>
              if (minSeen < r._3) out += ((r._3, band, minSeen, r._4, -1.0))
              else if (r._3 < minSeen) {
                if (minSeen != Long.MaxValue) {
                  val j = jaccardSortedSeq(repSh, r._4)
                  out += ((minSeen, band, r._3, repSh, j))
                  displaced.add(1L)
                  // a VERIFIED relink folds the old rep's cluster into
                  // the new rep's — the over-connection channel.
                  // NOTE: displaced/overConnect are incremented inside
                  // task execution, so they count AT-LEAST-ONCE under
                  // task retries / speculative duplicates; the pair
                  // stays internally consistent (same code path), but
                  // an exactly-once rate must be derived from the
                  // emitted displaced rows in the sink, which are
                  // deduplicated per output row
                  if (j >= 0.5) overConnect.add(1L)
                }
                minSeen = r._3; repSh = r._4
              }
            }
            state.update((minSeen, repSh))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
      .toDF("doc_id", "band", "dup_of", "shset", "pre_j")
    // stream-static LEFT join: a normal candidate whose rep is missing
    // from history gets null jaccard and falls to the filter (as the
    // old inner join dropped it); a displaced pair carries its
    // in-handler value and never needs the lookup
    val hw = TextOps.tokens(col("text"))
    val reps = history.filter(size(hw) >= 3)
      .select(col("doc_id").as("dup_of"),
        graft.functions.SetFunctions.shingleHashSet(col("text"), 3).as("rep_sh"))
    cand.join(reps, Seq("dup_of"), "left")
      .select(col("doc_id"), col("band"), col("dup_of"),
        when(col("pre_j") >= 0, col("pre_j"))
          .otherwise(graft.functions.SetFunctions.jaccardSorted(
            col("shset"), col("rep_sh"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** `foreachBatch` sink maintaining a near-dup CLUSTER LABELING across
    * micro-batches — the streaming form of q130's incremental
    * composition. Each epoch folds the batch's (doc_id, dup_of) edges
    * into the prior labeling by running
    * [[graft.operators.Dedup.connectedComponents]] over
    * (prior star edges ∪ batch edges): O(batch + components) per epoch,
    * never O(everything seen). A batch that BRIDGES two existing
    * clusters merges them — plain stateful streaming can't express that
    * (cluster identity is a global property), which is why this is a
    * sink-side fold, not a `flatMapGroupsWithState`.
    *
    * Labels persist EPOCH-VERSIONED under `labelsRoot/epoch=N`:
    *  - the prior labeling is the largest epoch < N, so a replayed epoch
    *    (at-least-once delivery) recomputes from the same prior and
    *    overwrites only its own directory — idempotent by construction;
    *  - the prior epoch's files are pruned only AFTER epoch N's write
    *    completes (the lazy final join reads them during the write);
    *  - the labeling covers docs that appeared in at least one edge;
    *    absent docs are implicit singletons (`rep = doc_id`), exactly as
    *    [[graft.operators.Dedup.connectedComponents]]'s left join treats
    *    edgeless docs.
    */
  def incrementalLabelSink(labelsRoot: String)(
      edges: DataFrame, epochId: Long): Unit = {
    val spark = edges.sparkSession
    val batchE = edges.select(col("doc_id").as("src"), col("dup_of").as("dst"))
    val epochs = Option(new java.io.File(labelsRoot).listFiles())
      .getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .map(f => f.getName.stripPrefix("epoch=").toLong)
    val priorEpoch = epochs.filter(_ < epochId).sorted.lastOption
    val prior = priorEpoch.map(e => spark.read.parquet(s"$labelsRoot/epoch=$e"))
    val docsSeen = (prior.map(_.select(col("doc_id"))) ++
        Seq(batchE.select(col("src").as("doc_id")),
          batchE.select(col("dst").as("doc_id"))))
      .reduce(_ union _).distinct()
    val starPrior = prior.map(_.filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("src"), col("rep").as("dst")))
    val allEdges = starPrior.map(batchE.union).getOrElse(batchE)
    graft.operators.Dedup.connectedComponents(docsSeen, allEdges)
      .write.mode("overwrite").parquet(s"$labelsRoot/epoch=$epochId")
    // prune superseded epochs now that this epoch is durable
    (epochs.toSet - epochId).filter(_ < epochId).foreach { e =>
      val p = new org.apache.hadoop.fs.Path(s"$labelsRoot/epoch=$e")
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      catch { case _: Throwable => () }
    }
  }

  /** Latest labeling written by [[incrementalLabelSink]] (None before the
    * first epoch commits). */
  def latestLabels(spark: SparkSession, labelsRoot: String): Option[DataFrame] =
    Option(new java.io.File(labelsRoot).listFiles())
      .getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .map(_.getName.stripPrefix("epoch=").toLong)
      .sorted.lastOption
      .map(e => spark.read.parquet(s"$labelsRoot/epoch=$e"))

  /** Batch twin of [[nearDupVerified]] — the q118 oracle surface. */
  def nearDupVerifiedBatch(docs: DataFrame, history: DataFrame): DataFrame = {
    val b = banded(docs)
    val reps = b.groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("dup_of"))
    val cand = b.join(reps, Seq("band", "bkey"))
      .filter(col("dup_of") < col("doc_id"))
      .select(col("doc_id"), col("band"), col("dup_of"), col("shset"))
    verifyAgainstReps(cand, history)
  }
}
