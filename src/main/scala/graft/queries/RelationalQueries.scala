package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory over the TPC-H-ish testdata (SURVEY §2.2
  * P8, §2.4 A5, §2.5 F10, §2.6 — all [EXT] built-in declarations).
  *
  * Every query is deterministic: explicit ORDER BY on a unique key, exact
  * decimal arithmetic for float aggregates (see [[Det]]), timestamps
  * surfaced as formatted strings (pyarrow tz-awareness differs between the
  * engines' parquet writers).
  *
  * Scale notes (100 TB design intent, verified on `.explain`):
  *  - fixed-size dimension joins (`region`, `nation`, `supplier`, `part`)
  *    are explicitly `broadcast()` — no shuffle of the fact table. Tables
  *    that GROW with scale factor (`customer`: 150 M rows / ~10 GiB+ at
  *    sf100, over Spark's 8 GiB broadcast limit) carry NO hint: AQE/CBO
  *    picks broadcast when the runtime size allows and a shuffled join
  *    when it doesn't — locked by `PlanShapeSpec`;
  *  - fact-fact joins (`lineitem` ⋈ `orders`) shuffle on the join key once,
  *    and AQE handles skew;
  *  - all aggregations are partial-aggregate-friendly (sum/count/min/max),
  *    so map-side combine runs before the exchange;
  *  - filters and projections are plain column predicates that push to the
  *    parquet scan (`PushedFilters`/`ReadSchema`).
  */
object RelationalQueries {
  import Det._

  private def T(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val all: Seq[Q] = Seq(
    // ---- q01: TPC-H Q1-style pricing summary (filter → groupBy → agg) ----
    Q("q01_pricing_summary", (s, d) => {
      val li = T(s, d, "lineitem")
      // kernel spread (PipelineQueries.spreadForKernels): the exact-
      // decimal partial aggregation is the query's whole cost and fuses
      // into the scan stage — ONE task on the single-row-group local
      // layout. The probe no-ops on any multi-split corpus, where the
      // scan parallelizes naturally and partial agg before the single
      // exchange remains the 100 TB shape (plan-locked with the dial off).
      PipelineQueries.spreadForKernels(
          li.filter(col("l_shipdate") <= lit("2000-09-02")), "l_orderkey")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${duckSum("l_quantity", 2)} AS sum_qty,
        ${duckSum("l_extendedprice", 2)} AS sum_base_price,
        ${duckSum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
        ${duckSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
        ${duckAvg("l_quantity", 2)} AS avg_qty,
        ${duckAvg("l_extendedprice", 2)} AS avg_price,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), bench = true),

    // ---- q02: selective filter + projection (parquet pushdown) ----
    Q("q02_filter_project", (s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_shipdate") >= lit("1999-01-01") &&
          col("l_shipdate") < lit("1999-04-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
      ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: TPC-H Q3-style top-N revenue (fact-fact join + topk) ----
    Q("q03_topk_revenue", (s, d) => {
      val cust = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = T(s, d, "orders").filter(col("o_orderdate") < lit("1998-06-01"))
      val li = T(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-06-01"))
      // pre-aggregate revenue per order key BEFORE the join (o_orderdate
      // functionally depends on o_orderkey, so grouping early is
      // equivalent): shrinks the join input by the lineitem fan-out —
      // the shuffle-minimizing plan at any scale. customer scales with sf
      // (150 M rows at sf100) so it gets NO broadcast hint — AQE decides.
      // kernel spread keyed on the GROUP key: on the single-row-group
      // local layout the one exchange moves from partial-agg output to
      // raw rows (groups are ~4 rows, partial combine saves little) and
      // the whole join tree parallelizes; no-op on multi-split corpora
      val liAgg = PipelineQueries.spreadForKernels(li, "l_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      liAgg.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }, Some(s"""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        ${duckSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""), bench = true),

    // ---- q04: EXISTS via left-semi join ----
    Q("q04_priority_exists", (s, d) => {
      val ord = T(s, d, "orders")
      val big = T(s, d, "lineitem").filter(col("l_quantity") >= 49).select(col("l_orderkey"))
      ord.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q05: TPC-H Q5-style multi-join through the star schema ----
    Q("q05_local_volume", (s, d) => {
      val li = T(s, d, "lineitem")
      val ord = T(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      val cust = T(s, d, "customer")
      val supp = T(s, d, "supplier")
      val nat = T(s, d, "nation")
      // supplier/nation are fixed-ratio dims → hinted broadcast; customer
      // grows with sf (would exceed the 8 GiB broadcast limit at sf100) →
      // no hint, AQE/CBO chooses shuffled vs broadcast at runtime.
      // kernel spread measured and NOT taken here (0.80→0.89 s, quiet-box
      // A/B r18): the ord/cust joins re-exchange on their own keys right
      // after, so the spread exchange buys only the supp broadcast probe
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }, Some(s"""
      SELECT n_name, ${duckSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
        count(*) AS n_items
      FROM lineitem, orders, customer, supplier, nation
      WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = s_nationkey AND c_nationkey = n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name"""), bench = true),

    // ---- q06: TPC-H Q6 forecast revenue (pure pushdown filter + agg) ----
    Q("q06_forecast_revenue", (s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n"))
    }, Some(s"""
      SELECT ${duckSum("l_extendedprice * l_discount", 4)} AS revenue, count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24"""),
      bench = true),

    // ---- q07: broadcast dimension join ----
    Q("q07_brand_volume", (s, d) => {
      T(s, d, "lineitem")
        .join(broadcast(T(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }, Some(s"""
      SELECT p_brand, ${duckSum("l_quantity", 2)} AS sum_qty, count(*) AS n
      FROM lineitem, part WHERE l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    // ---- q08: left-semi join surface ----
    Q("q08_semi_join", (s, d) => {
      val urgent = T(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      T(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),

    // ---- q09: left-anti join surface ----
    Q("q09_anti_join", (s, d) => {
      val ord = T(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      T(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_customers FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- q10: ranked window, top-k per group ----
    Q("q10_window_topk", (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }, Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""), bench = true),

    // ---- q11: running-total window (exact decimal inside the frame) ----
    Q("q11_window_running", (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "orders")
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 2)))
            .over(w).cast(org.apache.spark.sql.types.DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(20,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
      FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- q12: lag/lead analytics ----
    Q("q12_lag_lead", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("days_since_prev",
          datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
        .withColumn("next_orderkey", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("days_since_prev"), col("next_orderkey"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        date_diff('day',
          CAST(lag(o_orderdate, 1) OVER w AS DATE),
          CAST(o_orderdate AS DATE)) AS days_since_prev,
        lead(o_orderkey, 1) OVER w AS next_orderkey
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    // ---- q13: distinct ----
    Q("q13_distinct", (s, d) => {
      T(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    // ---- q14: rollup (NULLS FIRST to match Spark's asc default) ----
    Q("q14_rollup", (s, d) => {
      T(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n, ${duckSum("l_quantity", 2)} AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- q98: explicit GROUPING SETS + grouping_id — the general form
    // behind rollup/cube (q14/q15); grouping_id's bitmask distinguishes
    // a genuine NULL group key from an aggregated-away dimension, and
    // both engines encode it per the SQL standard so it hash-matches.
    // Planned as a single expand + one partial-agg shuffle. ----
    Q("q98_grouping_sets", (s, d) => {
      T(s, d, "lineitem").createOrReplaceTempView("li_gs")
      s.sql(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping_id() AS BIGINT) AS gid,
          count(1) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(20, 2))) AS DOUBLE) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        count(*) AS n, ${duckSum("l_quantity", 2)} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- q15: cube ----
    Q("q15_cube", (s, d) => {
      T(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        ${duckSum("o_totalprice", 2)} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- q16: union (dedup) ----
    Q("q16_union", (s, d) => {
      T(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(T(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy(col("nationkey"))
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    // ---- q17: except ----
    Q("q17_except", (s, d) => {
      val ord = T(s, d, "orders")
      ord.select(col("o_custkey").as("custkey"))
        .except(ord.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")))
        .orderBy(col("custkey"))
    }, Some("""
      SELECT o_custkey AS custkey FROM orders
      EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY custkey""")),

    // ---- q18: intersect ----
    Q("q18_intersect", (s, d) => {
      T(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(T(s, d, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    // ---- q19: group-by + having ----
    Q("q19_having", (s, d) => {
      T(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    }, Some(s"""
      SELECT o_custkey, count(*) AS n_orders, ${duckSum("o_totalprice", 2)} AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""")),

    // ---- q20: date functions (trunc to month) ----
    Q("q20_month_agg", (s, d) => {
      T(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("month"))
    }, Some(s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
        ${duckSum("o_totalprice", 2)} AS sum_price
      FROM orders GROUP BY month ORDER BY month""")),

    // ---- q21: string functions ----
    Q("q21_string_funcs", (s, d) => {
      T(s, d, "part")
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_brand"), 7, 10).as("brand_num"),
          concat_ws("/", col("p_type"), col("p_brand")).as("type_brand"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey, upper(p_name) AS uname, substr(p_brand, 7) AS brand_num,
        concat(p_type, '/', p_brand) AS type_brand, length(p_name) AS name_len
      FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""")),

    // ---- q22: JSON extraction (events.props) ----
    Q("q22_json", (s, d) => {
      T(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q23: conditional aggregation (pivot-style) ----
    Q("q23_case_agg", (s, d) => {
      T(s, d, "customer").join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)).as("n_building"),
          sum(when(col("c_mktsegment") === "AUTOMOBILE", 1).otherwise(0)).as("n_automobile"),
          count(lit(1)).as("n_total"))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name,
        CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
        CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n_automobile,
        count(*) AS n_total
      FROM customer, nation WHERE c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // ---- q24: stats (stddev from exact sums — engine-deterministic) ----
    Q("q24_stats", (s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          dstddev(col("l_extendedprice"), 4).as("std_price"))
        .orderBy(col("l_returnflag"))
    }, Some(s"""
      SELECT l_returnflag, min(l_extendedprice) AS min_price,
        max(l_extendedprice) AS max_price,
        ${duckAvg("l_extendedprice", 2)} AS avg_price,
        ${duckStddev("l_extendedprice", 4)} AS std_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q25: exact count-distinct ----
    Q("q25_count_distinct", (s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        count(DISTINCT l_partkey) AS n_part
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q26: global top-k sort/limit ----
    Q("q26_topk_global", (s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    }, Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ---- q27: as-of join by composition (SURVEY §2.6 [EXT]) ----
    Q("q27_asof_join", (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "events")
        .withColumn("last_signup_ts",
          max(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          date_format(col("last_signup_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_signup"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        strftime(last_signup_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_signup
      FROM (
        SELECT event_id, user_id, ts, event_type,
          max(CASE WHEN event_type = 'signup' THEN ts END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
        FROM events) t
      WHERE event_type = 'purchase' ORDER BY event_id""")),

    // ---- q28: banded self-join (theta/range join surface) ----
    Q("q28_range_join", (s, d) => {
      val a = T(s, d, "supplier").select(col("s_suppkey").as("sk_a"), col("s_acctbal").as("bal_a"))
      val b = T(s, d, "supplier").select(col("s_suppkey").as("sk_b"), col("s_acctbal").as("bal_b"))
      a.join(b, col("sk_a") < col("sk_b") &&
          abs(col("bal_a") - col("bal_b")) < 100.0)
        .select(col("sk_a"), col("sk_b"))
        .orderBy(col("sk_a"), col("sk_b"))
    }, Some("""
      SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b
      FROM supplier a, supplier b
      WHERE a.s_suppkey < b.s_suppkey AND abs(a.s_acctbal - b.s_acctbal) < 100.0
      ORDER BY sk_a, sk_b""")),

    // ---- q76: the SCALE form of q28 — band the continuous value into
    // width-sized buckets, explode each left row to its 3 candidate
    // bands, equi-join on the band key, then apply the exact range
    // predicate. Same result set as q28's theta join, but the plan is a
    // shuffled/broadcast EQUI join (plan-locked: no BNLJ/cartesian) —
    // the shape that survives when both sides are fact-sized. Each pair
    // matches exactly once (the right row's band is unique and the probe
    // list is distinct), so no dedup is needed. ----
    Q("q76_range_join_banded", (s, d) => {
      val width = 100.0
      val a = T(s, d, "supplier")
        .select(col("s_suppkey").as("sk_a"), col("s_acctbal").as("bal_a"))
        .withColumn("band_a", floor(col("bal_a") / width))
      val b = T(s, d, "supplier")
        .select(col("s_suppkey").as("sk_b"), col("s_acctbal").as("bal_b"))
        .withColumn("band_b", floor(col("bal_b") / width))
      a.withColumn("probe",
          explode(array(col("band_a") - 1, col("band_a"), col("band_a") + 1)))
        .join(b, col("probe") === col("band_b") && col("sk_a") < col("sk_b") &&
          abs(col("bal_a") - col("bal_b")) < width)
        .select(col("sk_a"), col("sk_b"))
        .orderBy(col("sk_a"), col("sk_b"))
    }, Some("""
      SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b
      FROM supplier a, supplier b
      WHERE a.s_suppkey < b.s_suppkey AND abs(a.s_acctbal - b.s_acctbal) < 100.0
      ORDER BY sk_a, sk_b""")),

    // ---- q29: pivot (fixed value list → deterministic schema) ----
    Q("q29_pivot", (s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity"), 2))
        .orderBy(col("l_returnflag"))
    }, Some(s"""
      SELECT l_returnflag,
        ${duckSum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS F,
        ${duckSum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q29b: approximate count-distinct (HLL++). The raw estimate is
    // engine-specific, so the ORACLE-FACING columns are the exact count
    // plus a Spark-computed `within_5pct` flag (the oracle asserts TRUE —
    // a wrong estimate flips the flag and fails the hash); the ScalaTest
    // suite separately asserts <5% error on the estimate itself. ----
    Q("q126_approx_distinct", (s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            lit(0.05) * col("exact_parts")).as("within_5pct"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        TRUE AS within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q57: scalar subquery through the SQL front-end ----
    Q("q57_scalar_subquery", (s, d) => {
      T(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
                                     / count(*) FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }, Some(s"""
      SELECT o_orderstatus, count(*) AS n
      FROM orders
      WHERE o_totalprice > (SELECT ${duckAvg("o_totalprice", 2)} FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- q58: IN / NOT IN subqueries through the SQL front-end ----
    Q("q58_in_subquery", (s, d) => {
      T(s, d, "part").createOrReplaceTempView("part")
      T(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT p_partkey, p_name,
          p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49) AS never_bulk
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        ORDER BY p_partkey""")
    }, Some("""
      SELECT p_partkey, p_name,
        p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49) AS never_bulk
      FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
      ORDER BY p_partkey""")),

    // ---- q61: exact percentiles (Spark percentile ≡ DuckDB
    // quantile_cont: both linear-interpolated; verified equal) ----
    Q("q61_percentiles", (s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q69: JSON → map column + explode (map functions) ----
    Q("q69_json_map", (s, d) => {
      T(s, d, "events")
        .select(col("event_id"),
          explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))))
        .select(col("event_id"), col("key"), col("value"))
        .orderBy(col("event_id"), col("key"))
    }, Some("""
      SELECT event_id, k AS key, CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS value
      FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events) t
      ORDER BY event_id, key""")),

    // ---- q63: array functions (sort/distinct/slice/join) ----
    Q("q63_array_funcs", (s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"),
          array_join(slice(array_sort(array_distinct(split(col("text"), " "))), 1, 5), ",")
            .as("first_tokens"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
          AS first_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents ORDER BY doc_id""")),

    // ---- q64: regex extraction ----
    Q("q64_regexp", (s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "(\\d+)-(\\w+)", 2).as("prio_word"),
          regexp_extract(col("o_orderpriority"), "(\\d+)-(\\w+)", 1).cast("int").as("prio_num"))
        .filter(col("prio_num") <= 2)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
        regexp_extract(o_orderpriority, '(\d+)-(\w+)', 2) AS prio_word,
        CAST(regexp_extract(o_orderpriority, '(\d+)-(\w+)', 1) AS INT) AS prio_num
      FROM orders
      WHERE CAST(regexp_extract(o_orderpriority, '(\d+)-(\w+)', 1) AS INT) <= 2
      ORDER BY o_orderkey""")),

    // ---- q65: conditional scalar functions ----
    Q("q65_conditionals", (s, d) => {
      T(s, d, "supplier")
        .select(col("s_suppkey"),
          coalesce(nullif(col("s_acctbal"), lit(0.0)), lit(-1.0)).as("bal_or_sentinel"),
          greatest(col("s_acctbal"), lit(5000.0)).as("floor5k"),
          least(col("s_acctbal"), lit(5000.0)).as("cap5k"),
          when(col("s_acctbal") > 5000, "high").otherwise("low").as("tier"))
        .orderBy(col("s_suppkey"))
    }, Some("""
      SELECT s_suppkey,
        coalesce(nullif(s_acctbal, 0.0), -1.0) AS bal_or_sentinel,
        greatest(s_acctbal, 5000.0) AS floor5k,
        least(s_acctbal, 5000.0) AS cap5k,
        CASE WHEN s_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier
      FROM supplier ORDER BY s_suppkey""")),

    // ---- q81: histogram-sketch median — the 100 TB form of a quantile:
    // one partial-aggregating pass into fixed-width bins (the histogram
    // is k counters per group, like the CMS buffer) + linear
    // interpolation inside the straddling bin. Exact `percentile`
    // requires materializing every value per group; this is one
    // map-side-combined shuffle of bin counts. The exact value rides
    // along to show the approximation error. All-integer counts →
    // identical interpolation doubles on both engines. ----
    Q("q81_histogram_quantile", (s, d) => {
      val binW = 1000.0
      val li = T(s, d, "lineitem")
      val hist = li.groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") / binW).as("bin"))
        .agg(count(lit(1)).as("c"))
      val byFlag = Window.partitionBy(col("l_returnflag"))
      val cumW = byFlag.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = hist
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("total", sum(col("c")).over(byFlag))
        .filter(col("cum") >= col("total") * 0.5)
        .withColumn("rn", row_number().over(byFlag.orderBy(col("bin"))))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"),
          round(col("bin") * binW +
            ((col("total") * 0.5 - (col("cum") - col("c"))) / col("c")) * binW, 6)
            .as("p50_approx"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_exact"))
      med.join(exact, "l_returnflag").orderBy(col("l_returnflag"))
    }, Some("""
      WITH hist AS (
        SELECT l_returnflag, floor(l_extendedprice / 1000.0) AS bin, count(*) AS c
        FROM lineitem GROUP BY 1, 2),
      cum AS (
        SELECT l_returnflag, bin, c,
          sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(c) OVER (PARTITION BY l_returnflag) AS total
        FROM hist),
      med AS (
        SELECT l_returnflag,
          round(bin * 1000.0 + ((total * 0.5 - (cum - c)) / c) * 1000.0, 6) AS p50_approx
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY bin) AS rn
              FROM cum WHERE cum >= total * 0.5) t
        WHERE rn = 1),
      exact AS (
        SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact
        FROM lineitem GROUP BY l_returnflag)
      SELECT m.l_returnflag AS l_returnflag, m.p50_approx, e.p50_exact
      FROM med m JOIN exact e ON m.l_returnflag = e.l_returnflag
      ORDER BY m.l_returnflag""")),

    // ---- q80: NTILE quantile bucketing (deterministic: the window
    // ordering includes the unique order key) ----
    Q("q80_ntile", (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        ntile(4) OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders ORDER BY o_orderkey""")),

    // ---- q59: RANGE window frame (value-based, order-insensitive sums) ----
    Q("q59_range_frame", (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
      T(s, d, "orders")
        .withColumn("near_spend",
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 2)))
            .over(w).cast(org.apache.spark.sql.types.DoubleType))
        .select(col("o_orderkey"), col("o_orderstatus"), col("near_spend"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(20,2)))
             OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS near_spend
      FROM orders ORDER BY o_orderkey""")),

    // ---- q106: two-phase SALTED aggregation through the gate. The
    // returnflag aggregate funnels the whole fact table into 3 reducer
    // keys — the canonical hot-key shape at 100 TB. Skew.saltedSum
    // spreads each key over 16 deterministic salts (first shuffle:
    // (key, salt), 48 cells), combines partials, then re-aggregates the
    // 48-row partial set on the key alone. Exact decimal sums keep the
    // two-phase total bit-identical to the one-phase oracle. Plan-locked
    // in PlanShapeSpec (two exchanges, partial aggregation in both). ----
    Q("q106_salted_hot_agg", (s, d) => {
      graft.operators.Skew.saltedSum(
          T(s, d, "lineitem"),
          keys = Seq("l_returnflag"),
          value = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 2)),
          valueName = "sum_qty", salts = 16,
          discriminators = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(col("l_returnflag"),
          col("sum_qty").cast(org.apache.spark.sql.types.DoubleType).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }, Some(s"""
      SELECT l_returnflag, ${duckSum("l_quantity", 2)} AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q111: FULL OUTER join — per-day order activity vs ship
    // activity; shipping lags orders, so both null sides occur. Scale
    // shape: both inputs pre-aggregate to day grain (partial agg before
    // their exchanges), the join shuffles only the tiny day tables. ----
    Q("q111_full_outer", (s, d) => {
      val o = T(s, d, "orders").groupBy(col("o_orderdate").as("od"))
        .agg(count(lit(1)).as("n_orders"))
      val l = T(s, d, "lineitem").groupBy(col("l_shipdate").as("sd"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, col("od") === col("sd"), "full_outer")
        .select(coalesce(col("od"), col("sd")).as("d"),
          col("n_orders"), col("n_ships"))
        .orderBy(col("d"))
    }, Some("""
      WITH o AS (SELECT o_orderdate AS od, count(*) AS n_orders
                 FROM orders GROUP BY 1),
      l AS (SELECT l_shipdate AS sd, count(*) AS n_ships
            FROM lineitem GROUP BY 1)
      SELECT coalesce(od, sd) AS d, n_orders, n_ships
      FROM o FULL OUTER JOIN l ON od = sd ORDER BY d""")),

    // ---- q112: UNPIVOT (melt) — wide per-flag metric columns to long
    // (metric, value) rows, the inverse of q29_pivot. Unpivot is a
    // zero-shuffle expression expansion over the 3-row aggregate. ----
    Q("q112_unpivot", (s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_price"),
          dsum(col("l_discount"), 2).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }, Some(s"""
      WITH w AS (SELECT l_returnflag,
          ${duckSum("l_quantity", 2)} AS sum_qty,
          ${duckSum("l_extendedprice", 2)} AS sum_price,
          ${duckSum("l_discount", 2)} AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        UNPIVOT w ON sum_qty, sum_price, sum_disc
        INTO NAME metric VALUE value)
      ORDER BY l_returnflag, metric""")),

    // ---- q153: ordered funnel (view → click → purchase, each step
    // strictly after the previous, all within 24 h of the user's FIRST
    // view) — the product-analytics operator the window/session family
    // doesn't cover: step timestamps must be ORDERED, not merely
    // co-present. Scale shape: NO per-user event collection — each step
    // is a conditional-min aggregation (map-side partial min per user
    // BEFORE its exchange; the event-type filter pushes to the scan)
    // joined user-keyed to the previous step's ≤1-row-per-user table
    // (AQE broadcasts the funnel head while it fits, shuffles on
    // user_id when it doesn't). Per step: one filtered scan + one
    // exchange of ≤1 row per qualifying user, at any corpus size. The
    // final counts fold the three step tables in ONE aggregation (no
    // scalar-subquery cross join). Timestamps compare as unix micros —
    // exact integer arithmetic in both engines. ----
    Q("q153_funnel_steps", (s, d) => {
      val W = 86400000000L // 24 h in micros
      val ev = T(s, d, "events").select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      val u1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tu")).as("t1"))
      val u2 = ev.filter(col("event_type") === "click")
        .join(u1, "user_id")
        .filter(col("tu") > col("t1") && col("tu") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1")).agg(min(col("tu")).as("t2"))
      val u3 = ev.filter(col("event_type") === "purchase")
        .join(u2, "user_id")
        .filter(col("tu") > col("t2") && col("tu") <= col("t1") + W)
        .groupBy(col("user_id")).agg(min(col("tu")).as("t3"))
      u1.select(lit(1).as("step"))
        .union(u2.select(lit(2).as("step")))
        .union(u3.select(lit(3).as("step")))
        .agg(count(when(col("step") === 1, 1)).as("users_view"),
          count(when(col("step") === 2, 1)).as("users_click"),
          count(when(col("step") === 3, 1)).as("users_purchase"))
        .select(col("users_view"), col("users_click"), col("users_purchase"),
          rat6(col("users_click"), col("users_view")).as("click_rate"),
          rat6(col("users_purchase"), col("users_click")).as("purchase_rate"))
    }, Some(s"""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
      u1 AS (SELECT user_id, min(tu) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY 1),
      u2 AS (SELECT e.user_id, t1, min(tu) AS t2 FROM ev e JOIN u1 USING (user_id)
             WHERE event_type = 'click' AND tu > t1 AND tu <= t1 + 86400000000
             GROUP BY e.user_id, t1),
      u3 AS (SELECT e.user_id, min(tu) AS t3 FROM ev e JOIN u2 USING (user_id)
             WHERE event_type = 'purchase' AND tu > t2 AND tu <= t1 + 86400000000
             GROUP BY e.user_id),
      c AS (SELECT count(CASE WHEN step = 1 THEN 1 END) AS users_view,
              count(CASE WHEN step = 2 THEN 1 END) AS users_click,
              count(CASE WHEN step = 3 THEN 1 END) AS users_purchase
            FROM (SELECT 1 AS step FROM u1 UNION ALL
                  SELECT 2 FROM u2 UNION ALL SELECT 3 FROM u3))
      SELECT users_view, users_click, users_purchase,
        ${duckRat6("users_click", "users_view")} AS click_rate,
        ${duckRat6("users_purchase", "users_click")} AS purchase_rate
      FROM c"""), bench = true),

    // ---- q154: retention cohorts — users cohorted by the Monday-start
    // week of their first signup; active at week-offset w when ANY
    // event lands in cohort_week + w. Scale shape: (user, week)
    // activity is map-side-deduped before its one exchange; the cohort
    // table is ≤1 row per user (AQE broadcast/shuffle on user_id); the
    // final (cohort, offset) rollup partial-aggregates. Week offsets
    // are exact integer day arithmetic (both engines truncate to
    // Monday, so the day diff is always a multiple of 7). ----
    Q("q154_retention_cohorts", (s, d) => {
      val ev = T(s, d, "events")
      val u = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cw"))
      val act = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("w")).distinct()
      val sizes = u.groupBy(col("cw")).agg(count(lit(1)).as("cohort_size"))
      act.join(u, "user_id").filter(col("w") >= col("cw"))
        .select(col("cw"),
          (datediff(col("w"), col("cw")) / lit(7)).cast("int").as("week_offset"))
        .groupBy(col("cw"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cw")
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_active"), col("cohort_size"),
          rat6(col("n_active"), col("cohort_size")).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }, Some(s"""
      WITH u AS (SELECT user_id, min(date_trunc('week', ts)) AS cw FROM events
                 WHERE event_type = 'signup' GROUP BY 1),
      act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
      sizes AS (SELECT cw, count(*) AS cohort_size FROM u GROUP BY 1),
      r AS (SELECT cw, date_diff('day', cw, w) // 7 AS week_offset,
              count(*) AS n_active
            FROM act JOIN u USING (user_id) WHERE w >= cw GROUP BY 1, 2)
      SELECT strftime(r.cw, '%Y-%m-%d') AS cohort_week,
        CAST(week_offset AS INT) AS week_offset, n_active, cohort_size,
        ${duckRat6("n_active", "cohort_size")} AS retention
      FROM r JOIN sizes ON r.cw = sizes.cw
      ORDER BY cohort_week, week_offset"""), bench = true),

    // ---- q156: session path analysis — gap-based sessionization
    // (30 min) then the ORDERED event-type sequence per session,
    // rolled up to the top paths. The flow-analysis complement of the
    // funnel: q153 asks "did users do A→B→C", this asks "what do
    // sessions actually look like". Scale shape: ONE user-keyed
    // exchange feeds both window passes (same partitioning + ordering
    // — the second window reuses the first's sort); the per-session
    // path collect is bounded by session length (the gap bounds it,
    // same law as the session-window store); the path rollup
    // partial-aggregates and the top-20 is a TakeOrdered, never a
    // global sort. Ties break on (ts, event_id) in BOTH engines, so
    // the paths are deterministic strings. ----
    Q("q156_session_paths", (s, d) => {
      val gap = 1800000000L // 30 min in micros
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tu"), col("event_id"))
      val e = T(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("tu"))
      val m = e.withColumn("is_new",
        when(lag(col("tu"), 1).over(w).isNull ||
          col("tu") - lag(col("tu"), 1).over(w) > gap, 1).otherwise(0))
      val sess = m.withColumn("sess", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("sess"))
        .agg(concat_ws(">", transform(sort_array(collect_list(
            struct(col("tu"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
    }, Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tu
                 FROM events),
      m AS (SELECT *, CASE WHEN tu - lag(tu) OVER w > 1800000000 OR
                                lag(tu) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
      s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
              ORDER BY tu, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
            FROM m),
      p AS (SELECT user_id, sess,
              string_agg(event_type, '>' ORDER BY tu, event_id) AS path
            FROM s GROUP BY user_id, sess)
      SELECT path, count(*) AS n_sessions FROM p
      GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20"""), bench = true),

    // ---- q159: the funnel at USER level — one row per completing user
    // with the exact (t1, t2, t3) step times q153 only counts. This is
    // the batch mirror the ST15x/ST15w streaming twins finalize against
    // (and the table a product team actually joins downstream). Same
    // scale shape as q153: conditional-min per step, ≤1 row per user per
    // step on the wire, no event collection, no windows. All-integer
    // output (unix micros), so the oracle hash needs no float
    // canonicalization. ----
    Q("q159_funnel_users", (s, d) => {
      val W = 86400000000L
      val ev = T(s, d, "events").select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      val u1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tu")).as("t1"))
      val u2 = ev.filter(col("event_type") === "click")
        .join(u1, "user_id")
        .filter(col("tu") > col("t1") && col("tu") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1")).agg(min(col("tu")).as("t2"))
      ev.filter(col("event_type") === "purchase")
        .join(u2, "user_id")
        .filter(col("tu") > col("t2") && col("tu") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1"), col("t2"))
        .agg(min(col("tu")).as("t3"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
      u1 AS (SELECT user_id, min(tu) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY 1),
      u2 AS (SELECT e.user_id, t1, min(tu) AS t2 FROM ev e JOIN u1 USING (user_id)
             WHERE event_type = 'click' AND tu > t1 AND tu <= t1 + 86400000000
             GROUP BY e.user_id, t1)
      SELECT e.user_id, t1, t2, min(tu) AS t3
      FROM ev e JOIN u2 USING (user_id)
      WHERE event_type = 'purchase' AND tu > t2 AND tu <= t1 + 86400000000
      GROUP BY e.user_id, t1, t2
      ORDER BY e.user_id"""))
  )

  /** Null-guarded exact-ratio surfaced as double via the decimal hop
    * (the cross-engine float canonicalization of [[Det]]): both engines
    * divide the same two exact integers, round at 6 decimals, and a
    * zero denominator is NULL rather than an engine-dependent inf/null.
    */
  private def rat6(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    when(b === 0, lit(null))
      .otherwise((a.cast(DoubleType) / b.cast(DoubleType))
        .cast(DecimalType(18, 6)).cast(DoubleType))
  }

  /** DuckDB rendering of [[rat6]] (VARCHAR hop: see [[Det]]). */
  private def duckRat6(a: String, b: String): String =
    s"""CASE WHEN $b = 0 THEN NULL ELSE
        CAST(CAST(CAST(CAST($a AS DOUBLE) / CAST($b AS DOUBLE)
          AS VARCHAR) AS DECIMAL(18, 6)) AS DOUBLE) END"""
}
