package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Aggregation / join / window operators — the §2f gaps the extension
  * surface deliberately fills (SURVEY.md §7.1.4), expressed with plain
  * codegen'd built-ins so the whole plan stays in whole-stage codegen.
  *
  * Float determinism: every SUM over a double column is computed as
  * `SUM(CAST(x AS DECIMAL))` then cast back to double — decimal addition
  * is exact and associative, so the result is bit-identical regardless of
  * partitioning/aggregation order, on Spark AND on the DuckDB oracle. A
  * raw double sum would be partition-order-dependent and could never
  * hash-match. */
object AnalyticsOps {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  // TPC-H Q1-shaped full-scan aggregation
  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.time.LocalDateTime.parse("1998-09-02T00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // TPC-H Q3-shaped: selective dim filter + two joins + top-k by revenue.
  // Customer side is broadcast (dimension << fact at every scale). The
  // fact side pre-aggregates per orderkey BEFORE the join: lineitem
  // arrives clustered by l_orderkey, so the map-side partial collapses
  // the ~4 lineitems/order to one shuffle row — the orderkey shuffle
  // moves one aggregated row per order instead of every lineitem, and the
  // subsequent orders join sees the small side (decimal sums are exact
  // and associative, so aggregating the unfiltered fact first changes
  // nothing about the per-order revenue the filter keeps).
  private def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, dir)
    val lAgg = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey").as("o_orderkey"))
      .join(lAgg, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // ROLLUP over the region/nation hierarchy
  private def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // CUBE over orderstatus × priority (all grouping-set combinations)
  private def aggCube(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // exact interpolated percentiles (sort-based, not a sketch): rounded to
  // 6 decimals so the two engines' interpolation arithmetic can't differ
  // in the last ulp
  private def percentiles(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        // both quantiles from ONE sort-based aggregation pass
        percentile(col("l_quantity"), array(lit(0.5), lit(0.9))).as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 6).as("p50_qty"),
        round(element_at(col("ps"), 2), 6).as("p90_qty"),
        col("n"))
      .orderBy("l_returnflag")

  // window functions: top-3 orders per customer
  private def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  // TPC-H Q5-shaped: five-way join through the region hierarchy plus the
  // supplier/customer co-nation condition; dims broadcast, one shuffle
  // for the final aggregation
  private def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    val s = t(spark, dir, "supplier")
    val n = nation(spark, dir)
    val r = region(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  // part/lineitem pricing stats by brand
  private def partBrandStats(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val l = lineitem(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        max(col("p_retailprice")).as("max_retail"),
        countDistinct(col("p_partkey")).as("n_parts"))
      .orderBy("p_brand")
  }

  // the window_rank semantics via the typed TopKByValue Aggregator: the
  // partial-aggregate plan shuffles ≤ k rows per key instead of all rows
  // (see graft.functions.TopKByValue scaladoc) — same rows, better plan
  private def windowTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = new graft.functions.TopKByValue(3).toColumn
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.name("topk"))
      .flatMap { case (ck, items) =>
        items.zipWithIndex.map { case ((ok, price), i) => (ck, ok, price, i + 1) }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  // left_semi / left_anti (EXISTS / NOT EXISTS)
  private def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val oKeys = orders(spark, dir).select(col("o_custkey"))
    val withOrders = c.join(oKeys, c("c_custkey") === oKeys("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val noOrders = c.join(oKeys, c("c_custkey") === oKeys("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
    withOrders.unionAll(noOrders).orderBy("kind")
  }

  // INTERSECT / EXCEPT set semantics (distinct rows)
  private def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
    val highBal = c.filter(col("c_acctbal") > 5000).select(col("c_nationkey"))
    val both = building.intersect(highBal)
      .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val onlyB = building.except(highBal)
      .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    both.unionAll(onlyB).orderBy("op")
  }

  /** GROUPING SETS — the general form of the rollup/cube family
    * (arbitrary grouping combinations in ONE pass over the data, one
    * partial-combine aggregate per set): per-(nation, segment),
    * per-nation, and per-segment customer stats. `grouping(col)` flags
    * (0/1) disambiguate a real NULL from an aggregated-out dimension on
    * both engines — more portable than the engines' differently
    * bit-ordered grouping_id(). Expressed via SQL (the DataFrame API
    * has rollup/cube but not arbitrary sets); the dim join is
    * broadcast. */
  private def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).join(broadcast(nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"),
        col("c_acctbal").cast(DecimalType(30, 2)).as("bal"))
      .createOrReplaceTempView("gs_cust")
    spark.sql(
      """SELECT n_name, c_mktsegment,
        |  CAST(grouping(n_name) AS INT) AS g_nation,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_segment,
        |  count(*) AS n_cust,
        |  CAST(sum(bal) AS DOUBLE) AS sum_bal
        |FROM gs_cust
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment))
        |ORDER BY g_nation, g_segment, n_name NULLS FIRST, c_mktsegment NULLS FIRST
        |""".stripMargin)
  }

  private val aggGroupingSetsOracle: String =
    """SELECT n_name, c_mktsegment,
      |  CAST(GROUPING(n_name) AS INT) AS g_nation,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
      |  count(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment))
      |ORDER BY g_nation, g_segment, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  /** Distribution window functions — ntile quartiles, percent_rank and
    * cume_dist of customers within their market segment by balance.
    * percent_rank = (rank−1)/(n−1) and cume_dist = rank_peers/n are
    * exact rational doubles from integer inputs (one IEEE division
    * each), rounded at 6; the (balance, custkey) order key is unique so
    * both engines rank identically. One window stage per segment shard
    * at any scale. */
  private def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  private val windowDistributionOracle: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
      |  ROUND(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** PIVOT — long-to-wide reshaping with an EXPLICIT pivot-value list
    * (`pivot(col, values)`): per order priority, order counts by status
    * as columns. The explicit list is the scale rule — value-discovering
    * pivot runs a blocking distinct scan and can explode the schema;
    * pinned values keep the plan one partial-combine aggregate whose
    * width is known at plan time (and make the oracle's CASE columns
    * deterministic). */
  private def pivotStatusCounts(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  private val pivotStatusCountsOracle: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pivot_status_counts" -> (pivotStatusCounts _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "window_distribution" -> (windowDistribution _),
    "set_ops" -> setOps,
    "q1_agg" -> q1Agg,
    "q3_top_revenue" -> q3TopRevenue,
    "q5_multi_join" -> q5MultiJoin,
    "part_brand_stats" -> partBrandStats,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "percentiles" -> percentiles,
    "window_rank" -> windowRank,
    "window_topk_agg" -> windowTopkAgg,
    "semi_anti_join" -> semiAntiJoin
  )

  val oracles: Map[String, String] = Map(
    "pivot_status_counts" -> pivotStatusCountsOracle,
    "agg_grouping_sets" -> aggGroupingSetsOracle,
    "window_distribution" -> windowDistributionOracle,
    "window_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "set_ops" ->
      """SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 5000)
        |UNION ALL
        |SELECT 'except', count(*) FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY op""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem, orders, customer, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "part_brand_stats" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  MAX(p_retailprice) AS max_retail,
        |  count(DISTINCT p_partkey) AS n_parts
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
        |FROM customer, nation, region
        |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "semi_anti_join" ->
      """SELECT 'with_orders' AS kind, count(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders', count(*) FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind""".stripMargin
  )
}
