package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs at sf0.001 and produces a sane result;
  * the exact-value gate is the DuckDB oracle (tools/check_oracle.py, and
  * the driver's t2 at sf0.01).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // queries that legitimately return few/zero rows at the smallest sf
  private val mayBeEmpty = Set("q45_ngram_jaccard", "q48_ann_search")

  test("entry flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has distinct name and every oracle has a query") {
    val names = SparkEntry.packs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.packs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, dir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("q127 inverted-index containment catches the extreme-size-ratio pair banding misses") {
    // a 5-shingle doc quoted verbatim inside a ~600-word doc: the
    // container's MinHash signature is dominated by its own content, so
    // the banded candidate path (q122) never pairs them — the
    // documented recall limit the inverted-index variant exists to
    // close. Containment is 5/5 = 1.0.
    // words chosen so ≥2 of the small doc's 5 shingles survive the
    // 1-in-4 consistent shingle sketch (a1..a7 → 'a2 a3 a4','a4 a5 a6')
    import spark.implicits._
    val small = (1 to 7).map(i => s"a$i").mkString(" ")
    val big = small + " " + (1 to 600).map(i => s"z$i").mkString(" ")
    val td = java.nio.file.Files.createTempDirectory("contain").toString
    Seq((1L, small, "en", "src", small.length.toLong),
        (2L, big, "en", "src", big.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$td/documents.parquet")
    val inv = SparkEntry.queries("q127_containment_inverted")(spark, td).collect()
    // both sampled shingles of doc 1 appear in doc 2's sample —
    // consistent sketching keeps identical-content containment at 1.0
    assert(inv.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
        == Set((1L, 2L, 1.0)), s"got ${inv.mkString(",")}")
    val banded = SparkEntry.queries("q122_containment_dedup")(spark, td).count()
    assert(banded == 0,
      "premise broken: banding found the extreme-ratio pair — the " +
        "recall-difference this test locks no longer exists")
  }

  /** q127's shingle stream has two split-aware physical forms: map-side
    * native ShinglesK+explode (multi-split corpora — no token-stream
    * exchange) and the windowed-lead form (single-row-group local
    * testdata — pays one exchange to parallelize). Both must produce
    * the bit-identical query result.
    */
  test("q127 map-side and windowed shingle streams produce identical results") {
    def rows(forceMapSide: Boolean) =
      queries.PipelineQueries.q127Frame(spark, dir, Some(forceMapSide))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val mapSide = rows(forceMapSide = true)
    val windowed = rows(forceMapSide = false)
    assert(mapSide.nonEmpty)
    assert(mapSide == windowed,
      s"diff: ${(mapSide diff windowed) ++ (windowed diff mapSide)}")
  }

  test("capped posting collector: kept groups complete, oversized groups truncate to cap+1") {
    // the q127 bounded-buffer contract (round-6 ADVICE): with
    // maxElems = cap+1, a group whose true df ≤ cap carries its COMPLETE
    // sorted list (result-identical to uncapped collect_list), and a
    // hot-shingle group truncates to exactly cap+1 — always > cap, so
    // the df filter drops the same groups, while no aggregation buffer
    // ever holds more than cap+1 elements.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cap = 3
    // group g repeats g times over 8 input partitions (partial buffers merge)
    val rows = (1L to 6L).flatMap(g => (1L to g).map(i => (g, i)))
    val df = spark.createDataset(rows).repartition(8).toDF("g", "v")
    val agg = df.groupBy(col("g"))
      .agg(sort_array(graft.functions.CollectCapped.pairs(
        struct(col("v"), col("g")), cap + 1)).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    (1L to 6L).foreach { g =>
      val got = agg(g)
      if (g <= cap + 1) {
        assert(got.map(_.getLong(0)) == (1L to g),
          s"group $g (df=$g ≤ cap+1) must carry its complete sorted list")
      } else {
        assert(got.size == cap + 1,
          s"group $g (df=$g > cap+1) must truncate to exactly cap+1=${cap + 1}, got ${got.size}")
      }
    }
  }

  test("q129's salted pre-cap equals the direct per-source window on a hot domain") {
    // the scale claim behind q129: pre-capping top-K per (source, salt)
    // prunes NO global-top-K member (each bucket's top-K is a superset
    // of the global winners that hash to it), so the final window sees
    // ≤ K×nSalts rows per source yet returns exactly the direct result.
    // Synthetic skew: one domain with 5000 docs, two with 20.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 10
    val docs = ((1L to 5000L).map(i => (i, s"text $i", "hot")) ++
        (5001L to 5020L).map(i => (i, s"text $i", "s1")) ++
        (5021L to 5040L).map(i => (i, s"text $i", "s2")))
      .toDF("doc_id", "text", "source").repartition(8)
    import org.apache.spark.sql.expressions.Window
    val ckey = md5(concat(lit("cap|"), coalesce(col("text"), lit(""))))
    val base = docs.select(col("doc_id"), col("source"), ckey.as("ckey"),
      pmod(xxhash64(col("doc_id")), lit(8)).as("salt"))
    val w1 = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("ckey"), col("doc_id"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("ckey"), col("doc_id"))
    val salted = base
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("cap_rank", row_number().over(w2)).filter(col("cap_rank") <= k)
      .select(col("doc_id"), col("source"), col("cap_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val direct = base
      .withColumn("cap_rank", row_number().over(w2)).filter(col("cap_rank") <= k)
      .select(col("doc_id"), col("source"), col("cap_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(salted == direct,
      s"salted pre-cap changed the kept set: ${(salted diff direct) ++ (direct diff salted)}")
    assert(direct.count(_._2 == "hot") == k && direct.count(_._2 == "s1") == k)
  }
}
