package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions end-to-end: all three injection legs (planner strategy,
  * functions, resolution rule) live in the shared test session, which is
  * built with `.withExtensions(new GraftExtensions)` exactly like a
  * `spark.sql.extensions=graft.GraftExtensions` deployment.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("injected dot_product function resolves in SQL") {
    assert(spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
  }

  test("injected cms_md5 aggregate resolves in SQL") {
    val sk = spark.sql("SELECT cms_md5(t) FROM VALUES ('x'), ('x'), ('y') AS v(t)")
      .head().getSeq[Long](0)
    assert(sk.length == 4 * 64)
    assert(sk.sum == 3 * 4) // each row increments one counter per depth row
  }

  test("injected topk_scored aggregate resolves in SQL") {
    val top = spark.sql(
      """SELECT g, topk_scored(named_struct('s', s, 'i', i), 2) AS t
         FROM VALUES (1, -0.9D, 10L), (1, -0.7D, 11L), (1, -0.9D, 3L),
                     (2, -0.5D, 20L)
         AS v(g, s, i) GROUP BY g ORDER BY g""")
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1))))
    assert(top.toSeq == Seq(
      1 -> Seq((-0.9, 3L), (-0.9, 10L)),
      2 -> Seq((-0.5, 20L))))
  }

  test("margin-expansion rule: with_m90(c) expands to c, c_m90 in SQL") {
    import spark.implicits._
    Seq(("g1", 10.0, 1.5, 99.0), ("g2", 20.0, 2.5, 99.0))
      .toDF("geoid", "under5", "under5_m90", "unrelated")
      .createOrReplaceTempView("margin_t")
    val out = spark.sql("SELECT geoid, with_m90(under5) FROM margin_t ORDER BY geoid")
    assert(out.columns.toSeq == Seq("geoid", "under5", "under5_m90"))
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq(("g1", 10.0, 1.5), ("g2", 20.0, 2.5)))
  }

  test("margin expansion keeps column pruning intact (scan reads no unrelated cols)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("margin-prune")
    Seq(("g1", 10.0, 1.5, 99.0)).toDF("geoid", "under5", "under5_m90", "unrelated")
      .write.mode("overwrite").parquet(dir.resolve("t").toString)
    spark.read.parquet(dir.resolve("t").toString).createOrReplaceTempView("margin_p")
    val p = spark.sql("SELECT with_m90(under5) FROM margin_p")
      .queryExecution.executedPlan.toString
    val readSchema = p.split("ReadSchema:")(1).split("\n")(0)
    assert(readSchema.contains("under5") && readSchema.contains("under5_m90"))
    assert(!readSchema.contains("unrelated") && !readSchema.contains("geoid"),
      s"expansion must not defeat pruning:\n$readSchema")
  }

  test("with_m90 in an aggregate select list expands to sum/RSS (groupBySum semantics)") {
    import spark.implicits._
    Seq(("g1", 3.0, 3.0), ("g1", 4.0, 4.0), ("g2", 5.0, 12.0))
      .toDF("g", "under5", "under5_m90")
      .createOrReplaceTempView("margin_agg")
    val out = spark.sql("SELECT g, with_m90(under5) FROM margin_agg GROUP BY g ORDER BY g")
    assert(out.columns.toSeq == Seq("g", "under5", "under5_m90"))
    // estimates sum; margins RSS: sqrt(3²+4²)=5 for g1, 12 for g2
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq(("g1", 7.0, 5.0), ("g2", 5.0, 12.0)))
  }

  test("with_m90 outside a select list fails with an actionable error") {
    import spark.implicits._
    Seq(("g1", 10.0, 1.5)).toDF("g", "under5", "under5_m90")
      .createOrReplaceTempView("margin_misuse")
    val e = intercept[Exception] {
      spark.sql("SELECT g FROM margin_misuse WHERE with_m90(under5) > 0").collect()
    }
    assert(e.getMessage.contains("top-level select item"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT with_m90(under5) + 1 FROM margin_misuse").collect()
    }
    assert(e2.getMessage.contains("top-level select item"), e2.getMessage)
  }

  test("missing margin partner fails analysis with a clear unresolved column") {
    import spark.implicits._
    Seq(("g1", 10.0)).toDF("geoid", "nomargin").createOrReplaceTempView("margin_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT with_m90(nomargin) FROM margin_bad").collect()
    }
    assert(e.getMessage.contains("nomargin_m90"))
  }

  test("injected parser: SHOW GRAFT QUERIES lists the inventory, normal SQL untouched") {
    val inv = spark.sql("SHOW GRAFT QUERIES")
    assert(inv.columns.toSeq == Seq("name", "has_oracle", "bench"))
    val names = inv.collect().map(_.getString(0)).toSeq
    assert(names.length == SparkEntry.queries.size && names == names.sorted)
    assert(names.contains("q01_pricing_summary") && names.contains("q87_neardup_fixpoint"))
    // delegation: ordinary statements still parse through the stock parser
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    // it composes with relational ops like any relation
    assert(spark.sql("SHOW GRAFT QUERIES").filter("has_oracle").count() > 80)
  }

  test("injected parser: DESCRIBE GRAFT QUERY returns the oracle; errors stay sane") {
    val r = spark.sql("DESCRIBE GRAFT QUERY q01_pricing_summary").head()
    assert(r.getString(0) == "q01_pricing_summary" &&
      r.getString(1).toUpperCase.startsWith("SELECT"))
    // unknown query name → actionable message
    val e = intercept[Exception] {
      spark.sql("DESCRIBE GRAFT QUERY nope").collect()
    }
    assert(e.getMessage.contains("SHOW GRAFT QUERIES"), e.getMessage)
    // malformed stock SQL still raises the standard parse error
    val pe = intercept[Exception] { spark.sql("SELEC 1").collect() }
    assert(pe.getMessage.toUpperCase.contains("SYNTAX"), pe.getMessage)
  }

  test("injected parser: near-miss graft syntax falls through to the vanilla parser") {
    // anything that isn't EXACTLY a graft statement must delegate — the
    // custom syntax adds zero blast radius to normal SQL, including its
    // own near-misses
    // each near-miss must surface a VANILLA error (parse error, or — for
    // "DESCRIBE GRAFT QUERY", which is legal stock SQL describing column
    // QUERY of table GRAFT — an unresolved-table error), never the graft
    // path's "unknown graft query" message
    Seq("SHOW GRAFT", "DESCRIBE GRAFT QUERY", "SHOW GRAFT QUERIES LIKE 'x'",
        "SHOW GRAFTQUERIES").foreach { s =>
      val e = intercept[Exception] { spark.sql(s).collect() }
      assert(!e.getMessage.contains("graft query"),
        s"'$s' hit the graft path instead of delegating: ${e.getMessage.take(120)}")
      assert(e.getMessage.toUpperCase.contains("SYNTAX") ||
        e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        s"'$s' raised an unexpected error: ${e.getMessage.take(120)}")
    }
    // case-insensitive + trailing semicolon still hit the graft path
    assert(spark.sql("show graft queries;").count() > 100)
  }

  test("frame_samples table-valued function resolves in SQL") {
    val idx = spark.sql("SELECT frame_idx FROM frame_samples(30, 4) ORDER BY frame_idx")
      .collect().map(_.getInt(0)).toSeq
    assert(idx == Seq(0, 7, 15, 22))
    // composes with plain relational ops
    val n = spark.sql(
      "SELECT count(*) FROM frame_samples(10, 3) WHERE frame_idx > 0").head().getLong(0)
    assert(n == 2)
  }

  test("as-of join strategy is injected (no imperative registration needed)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 2.0)).toDF("rk", "rt", "v")
    val out = graft.operators.AsOf.join(left, right,
      leftKey = "k", leftTime = "t", rightKey = "rk", rightTime = "rt")
    assert(out.collect().head.getDouble(5) == 2.0) // v from the matched right row
  }
}
