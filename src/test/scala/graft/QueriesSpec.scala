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
}
