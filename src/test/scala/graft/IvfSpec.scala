package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, TextOps}
import graft.queries.Tables

/** Trained-IVF quality gate: 2 Lloyd rounds + top-2 multi-probe must not
  * lose recall versus the untrained seed quantizer with a single probe —
  * the training has to pay for itself on real retrieval, not just produce
  * different centroids.
  */
class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val nQueries = 20

  private lazy val e = Tables(spark, dir, "embeddings").cache()

  private def queries: DataFrame =
    e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def topSets(scored: DataFrame): Map[Long, Set[Long]] = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getAs[Number](0).longValue)
      .view.mapValues(_.map(_.getAs[Number](1).longValue).toSet).toMap
  }

  /** Brute-force cosine top-10 per query — the ground truth. */
  private lazy val truth: Map[Long, Set[Long]] = topSets(
    e.crossJoin(queries).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        TextOps.cosine(col("embedding"), col("qv")).as("cosine")))

  private def ivfTop(cents: DataFrame, nprobe: Int): Map[Long, Set[Long]] = {
    val cells = Ivf.probeCells(queries, cents, nprobe)
      .select(col("qid"), col("qv"), col("cid").as("qcid"))
    topSets(Ivf.assign(e, cents)
      .join(cells, col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        TextOps.cosine(col("embedding"), col("qv")).as("cosine")))
  }

  private def recall(got: Map[Long, Set[Long]]): Map[Long, Double] =
    (0L until nQueries.toLong).map { q =>
      q -> got.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0
    }.toMap

  test("trained top-2-probe recall@10 >= untrained single-probe on >= 0.8 of queries") {
    val trained = recall(ivfTop(Ivf.trainCentroids(e, 8, 2), nprobe = 2))
    val baseline = recall(ivfTop(Ivf.seedCentroids(e, 8), nprobe = 1))
    val wins = (0L until nQueries.toLong).count(q => trained(q) >= baseline(q))
    info(s"mean recall trained+2probe = ${trained.values.sum / nQueries}, " +
      s"seed+1probe = ${baseline.values.sum / nQueries}, ties-or-wins = $wins/$nQueries")
    assert(wins >= (0.8 * nQueries).toInt,
      s"trained recall ${trained.toSeq.sorted} vs baseline ${baseline.toSeq.sorted}")
    assert(trained.values.sum >= baseline.values.sum,
      "training must not reduce aggregate recall")
  }

  test("lloyd update keeps k centroids of dim 64 on this data") {
    val c = Ivf.trainCentroids(e, 8, 2).collect()
    assert(c.length == 8, s"clusters emptied: ${c.length}")
    c.foreach(r => assert(r.getSeq[Double](1).length == 64))
  }
}
