package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** IVF coarse quantizer: deterministic k-means-lite training + assignment.
  *
  * The 100 TB shape: centroids are tiny (k × dim doubles) and always
  * broadcast; assignment is map-side (argmax of a codegen'd dot product
  * per row, zero shuffles over the corpus); each Lloyd update shuffles
  * only (cid, pos) partial sums — k·dim groups, independent of corpus
  * size. Search probes the query's top-`nprobe` cells only.
  *
  * Everything is cross-engine deterministic so the DuckDB oracle can
  * replay training bit-for-bit:
  *  - seeds are the embeddings of `vec_id < k` (no RNG);
  *  - assignment ranks by cosine ROUNDED to 6 places, ties → lowest cid;
  *  - the centroid mean uses the [[graft.queries.Det]] convention — exact
  *    decimal sum of 6-dec-rounded components, divided in double — so
  *    both engines produce identical centroid vectors;
  *  - both engines run EXACTLY `rounds` Lloyd iterations (unrolled CTEs
  *    on the oracle side), so convergence is irrelevant to parity.
  */
object Ivf {

  /** Deterministic seed centroids: the embeddings of `vec_id < k`. */
  def seedCentroids(e: DataFrame, k: Int): DataFrame =
    e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  /** Nearest-centroid assignment: argmax rounded cosine, ties → lowest
    * cid. Centroids broadcast; the corpus is never shuffled.
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        TextOps.cosine(col("embedding"), col("cv")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"), col("cos"))
  }

  /** One Lloyd update: element-wise mean per cluster. Components are
    * rounded to 6 decimals and summed as exact decimals (Det.davg
    * pattern) → the division is the same IEEE op in both engines.
    * An emptied cluster simply drops out (same in the oracle).
    */
  def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(round(col("col").cast(DoubleType), 6).cast(DecimalType(24, 6)))
        .cast(DoubleType) / count(lit(1))).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), transform(col("pm"), x => x.getField("m")).as("cv"))

  /** `rounds` unrolled Lloyd iterations from the deterministic seeds. */
  def trainCentroids(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    var c = seedCentroids(e, k)
    for (_ <- 1 to rounds) c = recompute(assign(e, c))
    c
  }

  /** The query vector's top-`nprobe` cells by rounded cosine (multi-probe:
    * rank 1 is the home cell, rank 2+ recover near-boundary neighbors).
    */
  def probeCells(queryVec: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    queryVec.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cid"),
        TextOps.cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
  }
}
