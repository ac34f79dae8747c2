package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A declared engine capability: a Spark query over the driver testdata plus
  * (when SQL-expressible) an equivalent DuckDB oracle query. The driver
  * hash-compares the two at sf0.01 (`BASELINE.json.metric`).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are also timed by Bench at sf0.1 */
    bench: Boolean = false)

object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two physical layouts across testdata
      // generations; normalize both to session-zone TIMESTAMP so every
      // downstream window/asof/date_format sees one type (sessions run
      // UTC, so the NTZ cast is wall-time-preserving and matches the
      // DuckDB oracle, which reads the same file as a naive timestamp).
      // The legacy nanosAsLong conf is session-global, so it is set ONLY
      // when the footer actually carries TIMESTAMP(NANOS) — the guard
      // matches the failure MESSAGE, not just the exception type, so an
      // unrelated read failure (missing path, corrupt footer) rethrows
      // instead of mutating session state out from under a concurrent
      // tenant (the EventsStream.readStream discipline).
      val raw =
        try s.read.parquet(s"$dir/events.parquet")
        catch {
          case e @ (_: org.apache.spark.sql.AnalysisException
               | _: org.apache.spark.SparkException)
              if String.valueOf(e.getMessage).contains("NANOS") =>
            s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            s.read.parquet(s"$dir/events.parquet")
        }
      raw.withColumn("ts", normalizedTs(raw.schema))
    } else s.read.parquet(s"$dir/$name.parquet")

  /** ts-layout dispatch, shared with the streaming source:
    *  - INT64 nanos (old TIMESTAMP(NANOS) files under nanosAsLong):
    *    floor-divide to micros — integer DIV, not double division (nanos
    *    ~1.7e18 exceeds double's 53-bit mantissa); floor matches DuckDB's
    *    nanos→micros truncation.
    *  - TIMESTAMP_NTZ (micros files when inferTimestampNTZ is on): cast
    *    to TIMESTAMP — identity on the stored micros under UTC sessions.
    *  - TIMESTAMP: already what downstream expects.
    */
  def normalizedTs(schema: org.apache.spark.sql.types.StructType): Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
      case _ => col("ts")
    }

  // Note on scan parallelism: the testdata ships ONE row group per file,
  // so each scan stage (with its fused filters/partial aggregates) runs on
  // a single core locally. A repartition-after-scan was measured and
  // REJECTED: the extra exchange defeats map-side combine and costs more
  // than the fused single-task pipeline saves (bench: 5.2s → 16.9s). On a
  // real cluster the writer controls row-group size (~128 MB), scans split
  // naturally, and no rebalancing is needed.
}

/** Cross-engine float determinism helpers.
  *
  * Summing doubles is order-dependent, and both engines aggregate in
  * nondeterministic partial orders — so sums that must hash-match are done
  * in exact decimal arithmetic on both sides:
  *
  *  - Spark: `sum(x.cast(DecimalType(p, s)))` — double→decimal cast rounds
  *    HALF_UP.
  *  - DuckDB: `sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(p, s)))` — the
  *    varchar hop matters: DuckDB's double→decimal cast TRUNCATES (0.125 →
  *    0.12) which would disagree with Spark for values like 901.82 stored
  *    as 901.819999…; its string→decimal parse rounds half-up like Spark.
  *
  * Inputs here are money/quantity columns with ≤2 decimal digits (verified
  * on the testdata), or products of them (≤6 digits), so the decimal cast
  * is lossless and both engines sum identical exact values.
  */
object Det {
  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18 + scale, scale))).cast(DoubleType)

  /** DuckDB rendering of [[dsum]]. */
  def duckSum(expr: String, scale: Int): String =
    s"CAST(sum(CAST(CAST($expr AS VARCHAR) AS DECIMAL(${18 + scale},$scale))) AS DOUBLE)"

  /** Exact mean: decimal sum / count, divided in double (both engines
    * divide the same two exact numbers — IEEE-deterministic).
    */
  def davg(c: Column, scale: Int): Column =
    (sum(c.cast(DecimalType(18 + scale, scale))).cast(DoubleType) / count(lit(1)))

  def duckAvg(expr: String, scale: Int): String =
    s"(${duckSum(expr, scale)} / count(*))"

  /** Sample stddev derived from exact decimal sums (x has ≤`scale/2`
    * decimals so x² is exact at `scale`): deterministic in both engines
    * with no rounding tolerance needed.
    */
  def dstddev(c: Column, scale: Int): Column = {
    val n = count(lit(1)).cast(DoubleType)
    val s1 = sum(c.cast(DecimalType(18 + scale, scale))).cast(DoubleType)
    val s2 = sum((c * c).cast(DecimalType(30 + scale, scale))).cast(DoubleType)
    // the sums are exact, but the final float expression can differ by an
    // ULP between engines (FMA contraction) — round to 6 places
    round(sqrt((s2 - s1 * s1 / n) / (n - lit(1))), 6)
  }

  def duckStddev(expr: String, scale: Int): String = {
    val s1 = duckSum(expr, scale)
    val s2 = s"CAST(sum(CAST(CAST(($expr)*($expr) AS VARCHAR) AS DECIMAL(${30 + scale},$scale))) AS DOUBLE)"
    s"round(sqrt(($s2 - $s1*$s1/count(*)) / (count(*) - 1)), 6)"
  }
}
