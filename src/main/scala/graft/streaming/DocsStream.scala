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
  * cardinality, not corpus size; a production deployment bounds the
  * horizon with state TTL (dedup-within-N-days) the same way the
  * watermarked dedup (ST5) does.
  *
  * Ordering contract: candidates match the batch twin when doc_ids
  * arrive in increasing order (the natural ingest order — ids are
  * assigned at ingest). Within a micro-batch the handler sorts, so only
  * CROSS-batch regressions of id order can diverge.
  */
object DocsStream {

  val docsSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")

  /** File-source stream over a directory of documents parquet. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir)

  /** q43's 4×2-hash banding, map-side: (doc_id, band, bkey). */
  def bandKeys(docs: DataFrame): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    val sh = TextOps.shingles3(ws)
    val mh = (0 until 8).map(j => TextOps.minhash(j, sh))
    val bands = (0 until 4).map(b => struct(lit(b).as("band"),
      concat_ws("_", mh(2 * b), mh(2 * b + 1)).as("bkey")))
    docs.filter(size(ws) >= 3)
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Streaming candidate emission: each doc whose (band, bucket) has an
    * earlier doc emits (doc_id, band, dup_of = the bucket's minimum).
    * Works on batch frames too, but the batch path should prefer
    * [[nearDupCandidatesBatch]] (a plain aggregation — no state store).
    */
  def nearDupCandidates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs)
      .select(col("band"), col("bkey"), col("doc_id"))
      .as[(Int, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          // sort within the batch: emission semantics are "min of all
          // earlier ids", independent of partition iteration order
          val ids = rows.map(_._3).toArray.sorted
          var minSeen = state.getOption.getOrElse(Long.MaxValue)
          val out = Array.newBuilder[(Long, Int, Long)]
          ids.foreach { id =>
            if (minSeen < id) out += ((id, band, minSeen))
            else if (id < minSeen) minSeen = id
          }
          state.update(minSeen)
          out.result().iterator
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
}
