package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DocsStream

/** A local-disk FileSystem registered under a NON-default scheme
  * (`graftfs://`) — the cheapest faithful stand-in for an hdfs:// or
  * s3a:// deployment root: every path under it resolves ONLY through the
  * Hadoop FileSystem API (a `java.io.File` probe of the raw string sees
  * nothing), while the bytes still land on local disk so the spec needs
  * no external daemon.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** The label store must be filesystem-PORTABLE: `incrementalLabelSink`,
  * compaction, and `latestLabels` list committed epochs through the
  * Hadoop FileSystem resolved from the root's own scheme — the same API
  * the writes and deletes use. The r16 defect this pins against: a
  * `java.io.File` listing silently returns NO parts on any non-local
  * scheme, so every epoch re-labels from only its own batch (cross-batch
  * merges lost) and `latestLabels` returns None — the finalized corpus
  * is silently un-deduplicated exactly in the hdfs://-rooted production
  * deployment the sink is for.
  */
class LabelStoreFsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def labelSet(root: String): Set[(Long, Long)] =
    DocsStream.latestLabels(spark, root)
      .getOrElse(fail(s"latestLabels returned None for $root"))
      .select(col("doc_id"), col("rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("label store on a non-default-scheme root: sink + compaction + " +
      "latestLabels see committed epochs through the Hadoop FS API; " +
      "labeling == local-path run == batch CC (ST13f)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val docs = graft.queries.Tables(spark, dir, "documents")
    val edges = DocsStream.nearDupCandidatesBatch(docs)
      .select(col("doc_id"), col("dup_of")).cache()
    assert(edges.count() > 0, "testdata must produce near-dup edges")
    // three epochs split by doc_id so later batches BRIDGE earlier
    // clusters — the cross-batch merges the broken listing lost
    val cuts = docs.stat.approxQuantile("doc_id", Array(0.33, 0.66), 0.0)
    val batches = Seq(
      edges.filter(col("doc_id") <= cuts(0)),
      edges.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      edges.filter(col("doc_id") > cuts(1)))
    // compactEvery=2 forces a compaction (its own listing + prune) to
    // run through the non-default scheme too
    def drive(root: String): Unit = {
      val sink = DocsStream.incrementalLabelSink(root, compactEvery = 2) _
      batches.zipWithIndex.foreach { case (b, i) => sink(b, i.toLong) }
    }
    val localRoot = java.nio.file.Files
      .createTempDirectory("labels-fs-local").toString
    val schemeDir = java.nio.file.Files
      .createTempDirectory("labels-fs-scheme").toString
    val schemeRoot = s"graftfs://$schemeDir"
    drive(localRoot)
    drive(schemeRoot)
    // the sink's own listing must see committed parts under the scheme
    val base = DocsStream.labelPartEpochs(spark, schemeRoot, "base")
    val delta = DocsStream.labelPartEpochs(spark, schemeRoot, "delta")
    assert(base.size + delta.size > 0,
      s"no committed parts listed under $schemeRoot (base=$base delta=$delta)")
    assert(base.size == 1,
      s"compaction did not fold/prune through the scheme: base=$base")
    // labeling parity: scheme run == local run == from-scratch batch CC
    val gotScheme = labelSet(schemeRoot)
    val gotLocal = labelSet(localRoot)
    assert(gotScheme == gotLocal, "scheme-rooted labeling != local-path: " +
      s"${((gotScheme diff gotLocal) ++ (gotLocal diff gotScheme)).take(20)}")
    val nodes = edges.select(col("doc_id"))
      .union(edges.select(col("dup_of").as("doc_id"))).distinct()
    val want = graft.operators.Dedup.connectedComponents(
        nodes, edges.select(col("doc_id").as("src"), col("dup_of").as("dst")))
      .select(col("doc_id"), col("rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotScheme == want, "scheme-rooted labeling != batch CC: " +
      s"${((gotScheme diff want) ++ (want diff gotScheme)).take(20)}")
    edges.unpersist()
  }
}
