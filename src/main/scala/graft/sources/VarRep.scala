package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

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

  /** URL of a published ACS Variance Replicate Estimates file — the
    * download behind the reference's
    * `get_varrep_dataframe(2015, 'B01001', '140', state='11', cache=False)`
    * (ref `test/test_basic.py:221-225`; layout per the Census Bureau's
    * public VRE documentation: one zipped long-format CSV per
    * (table, state) under the year + summary-level directory).
    */
  def varRepUrl(year: Int, tableId: String, summaryLevel: String, state: String): String =
    s"https://www2.census.gov/programs-surveys/acs/replicate_estimates/" +
      s"$year/data/5-year/$summaryLevel/${tableId}_$state.csv.zip"

  /** Cache key mirroring the censusreporter cache layout (S3). */
  private def cacheKey(year: Int, tableId: String, summaryLevel: String,
      state: String): String =
    s"varrep/$year/${tableId}_${summaryLevel}_$state.csv"

  /** If the payload is a ZIP archive (the published files are), extract
    * the first entry; otherwise treat it as plain CSV bytes (test
    * transports inject either).
    */
  private[graft] def unwrapCsv(payload: Array[Byte]): Array[Byte] =
    if (payload.length >= 4 && payload(0) == 'P' && payload(1) == 'K') {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(payload))
      require(zin.getNextEntry != null, "empty zip payload")
      zin.readAllBytes()
    } else payload

  private def httpGetBytes(url: String): Array[Byte] = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  /** Fetch a remote VRE file to a local CSV path, consulting the cache
    * first (same shape as CensusReporter.getResource: injectable
    * transport, cache-hit skips the fetch entirely). With `cache=false`
    * the CSV still lands in the cache dir (the Spark reader needs a
    * path) but is always re-fetched.
    */
  def fetchVarRep(year: Int, tableId: String, summaryLevel: String, state: String,
      cache: Boolean = true,
      cacheDir: Path = CensusReporter.defaultCacheDir,
      fetch: String => Array[Byte] = httpGetBytes): Path = {
    val cached = cacheDir.resolve(cacheKey(year, tableId, summaryLevel, state))
    if (!(cache && Files.exists(cached))) {
      val csv = unwrapCsv(fetch(varRepUrl(year, tableId, summaryLevel, state)))
      Files.createDirectories(cached.getParent)
      Files.write(cached, csv)
    }
    cached
  }

  /** One-call remote load — the engine's `get_varrep_dataframe`
    * (ref `test/test_basic.py:221-225`): URL construction → cached fetch
    * → long-format CSV → packed-replicate frame via [[loadVarRep]].
    */
  def load(spark: SparkSession, year: Int, tableId: String, summaryLevel: String,
      state: String, cache: Boolean = true,
      cacheDir: Path = CensusReporter.defaultCacheDir,
      fetch: String => Array[Byte] = httpGetBytes): DataFrame =
    loadVarRep(spark,
      fetchVarRep(year, tableId, summaryLevel, state, cache, cacheDir, fetch).toString)

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
