package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Event-stream-shaped operators over the `events` table, batch-first
  * (the streaming forms live in graft.streaming and are unit-tested with
  * the memory sink; same column logic).
  *
  * `ts` physical encoding varies by fixture generation (int64 nanos or
  * TIMESTAMP_NTZ micros); Tables.eventsWithTs probes the resolved type
  * and derives `ts_us` (epoch µs, bigint) either way, so everything here
  * uses exact integer microsecond math and stays bit-identical to the
  * DuckDB oracle (`epoch_us(ts)`) regardless of encoding. */
object EventOps {

  // keyed-latest dedup: last event per user (ts desc, event_id desc tiebreak)
  private def dedupKeyedLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    eventsWithTs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  // tumbling 1-hour window aggregation, through the real window() operator
  private def eventsHourlyAgg(spark: SparkSession, dir: String): DataFrame =
    eventsWithTs(spark, dir)
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast(DoubleType).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start_us", "event_type")

  /** Skew-hardened fact×dim join as a declared query: the events fact
    * side is salted across 8 buckets ([[graft.ops.ScaleJoins.saltedJoin]]
    * — deterministic content-hash salt, dim replicated once per salt,
    * join key widened to (key, salt)) and the result aggregated per
    * segment. The oracle is the PLAIN join — hash-matching it proves the
    * salting rewrite is semantics-preserving, which is the entire
    * contract of the 100 TB skew path (a hot key splits across `factor`
    * reducers instead of bottlenecking one; AQE's skew handling covers
    * sort-merge joins, salting covers the cases it can't — streaming
    * joins, single mega-keys). */
  private def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = events(spark, dir).select(col("user_id"), col("value"))
    val dim = customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.ops.ScaleJoins.saltedJoin(fact, dim, "user_id", factor = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 2))).cast(DoubleType).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  // sessionization (gaps-and-islands): new session when gap > 30 min
  private def sessionizeGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    eventsWithTs(spark, dir)
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Conversion funnel (view → click → purchase): per user, the earliest
    * time of each step occurring strictly AFTER the previous step —
    * sequential pattern matching as three conditional min-aggregations.
    * Every shuffle is on user_id (the groupBys and joins share the hash
    * partitioning, so Spark plans one exchange per aggregation and
    * reuses it for the joins); no window over the whole event stream, no
    * per-user event sorting. Users who never viewed are outside the
    * funnel (not emitted). */
  private def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsWithTs(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view_us"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts_us") > col("t_view_us"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click_us"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts_us") > col("t_click_us"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase_us"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"),
        (lit(1) + when(col("t_click_us").isNotNull, 1).otherwise(0) +
          when(col("t_purchase_us").isNotNull, 1).otherwise(0)).as("furthest_step"))
      .orderBy("user_id")
  }

  // typed metadata out of the JSON props column
  /** Gap-filling resample with forward fill — the time-series
    * regularization step monitoring/feature pipelines run before
    * modeling: per event_type, 15-minute bins over the corpus's global
    * [min, max] span; empty bins carry the PREVIOUS bin's sum forward
    * (`filled = true`), leading gaps before a type's first event stay
    * NULL. All bin math is exact integer microseconds; in-bin sums are
    * DECIMAL (order-independent); the fill copies already-agreed values,
    * so the whole frame hash-verifies.
    *
    * Scale shape: the global bounds are ONE one-row aggregate broadcast
    * under the (type × bin) grid (bounded BNLJ, the bm25 corpus-stats
    * pattern); the grid is O(types · span/15min) rows — metadata-scale
    * next to the events themselves — and the fill is one window per
    * type over that grid, never over raw events. */
  private def eventsResampleFfill(spark: SparkSession, dir: String,
                                  binUs: Long = 15L * 60 * 1000000): DataFrame = {
    val e = eventsWithTs(spark, dir)
      .select(col("event_type"), (col("ts_us") - (col("ts_us") % binUs)).as("bin_us"),
        col("value"))
    val bounds = e.agg(min(col("bin_us")).as("lo"), max(col("bin_us")).as("hi"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(binUs))).as("bin_us"))
    val binned = e.groupBy(col("event_type"), col("bin_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast(DoubleType).as("sum_value"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(binned, Seq("event_type", "bin_us"), "left")
      .select(col("bin_us"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("sum_value"),
        col("n").isNull.as("filled"))
      .orderBy("bin_us", "event_type")
  }

  private def eventsResampleFfillOracle(binUs: Long = 15L * 60 * 1000000): String =
    s"""WITH e AS (SELECT event_type,
       |  epoch_us(ts) - (epoch_us(ts) % $binUs) AS bin_us, value FROM events),
       |bounds AS (SELECT min(bin_us) AS lo, max(bin_us) AS hi FROM e),
       |grid AS (SELECT t.event_type, g.bin_us
       |         FROM (SELECT DISTINCT event_type FROM e) t
       |         CROSS JOIN (SELECT unnest(generate_series(lo, hi, $binUs)) AS bin_us
       |                     FROM bounds) g),
       |b AS (SELECT event_type, bin_us, count(*) AS n,
       |        CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
       |      FROM e GROUP BY 1, 2)
       |SELECT grid.bin_us, grid.event_type,
       |  COALESCE(b.n, 0) AS n,
       |  last_value(b.sum_value IGNORE NULLS) OVER (
       |    PARTITION BY grid.event_type ORDER BY grid.bin_us
       |    ROWS UNBOUNDED PRECEDING) AS sum_value,
       |  (b.n IS NULL) AS filled
       |FROM grid LEFT JOIN b USING (event_type, bin_us)
       |ORDER BY bin_us, event_type""".stripMargin

  /** Retention cohort matrix — the product-analytics staple: users
    * cohorted by first-seen day, per (cohort, day-offset) the count of
    * distinct cohort members active that day. All integer math (epoch-µs
    * day floors, distinct counts). One shuffle to find first-seen per
    * user, one keyed join back, one (cohort, offset) agg — each keyed on
    * user or cohort day, O(days²) output bound at any event volume. */
  private def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val e = eventsWithTs(spark, dir)
      .select(col("user_id"), (col("ts_us") - (col("ts_us") % dayUs)).as("day_us"))
    val cohort = e.groupBy(col("user_id"))
      .agg(min(col("day_us")).as("cohort_day_us"))
    e.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day_us"),
        ((col("day_us") - col("cohort_day_us")) / dayUs).cast(IntegerType)
          .as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day_us", "day_offset")
  }

  private val retentionCohortsOracle: String =
    """WITH e AS (SELECT user_id,
      |  epoch_us(ts) - (epoch_us(ts) % 86400000000) AS day_us FROM events),
      |c AS (SELECT user_id, min(day_us) AS cohort_day_us FROM e GROUP BY user_id)
      |SELECT c.cohort_day_us,
      |  CAST((e.day_us - c.cohort_day_us) // 86400000000 AS INT) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_day_us, day_offset""".stripMargin

  /** Fixed-point PageRank over the event-type transition graph — the
    * graph-centrality member of the analytics family (next to the
    * min-label connected components in TextOps). Nodes are the distinct
    * `event_type` values; a directed edge (src → dst, weight = count)
    * exists for every consecutive event pair within a user's timeline
    * (ordered by ts, event_id tiebreak). `iters` damped iterations of
    *
    *   pr'(v) = (1−d)/N + d · Σ_u pr(u) · w(u,v) / out(u)
    *
    * run ENTIRELY in 64-bit fixed-point arithmetic (probabilities scaled
    * by B = 10¹², d = 0.85 as ×85 div 100): every operation is integer
    * multiply / integer `div` / integer sum, so the result is
    * bit-identical on any engine and independent of aggregation order —
    * the same exactness discipline as the DECIMAL kmeans means, without
    * decimal-division scale rules. Dangling nodes (no out-edges) leak
    * their mass, matching the plain formula; all values are positive so
    * truncating and floor division agree engine-to-engine.
    *
    * Scale shape: the edge derivation is the data-scale part — one lag
    * window per user partition over the events scan, then a
    * partial-combined (src,dst) count. Each iteration is a join + sum
    * over the EDGE-TYPE table (|node|² worst case, metadata-scale for
    * any real event taxonomy), independent of corpus size. Overflow
    * bound: pr·w·85 ≤ B · w · 85 needs w < 10⁵·N of 2⁶³ — at larger
    * edge counts drop B one decade per decade of w.
    *
    * No reference counterpart (the reference has no graph op); published
    * algorithm: Page et al. 1999, "The PageRank Citation Ranking". */
  private def pagerankIter(spark: SparkSession, dir: String,
                           iters: Int = 3): DataFrame = {
    val B = 1000000000000L // fixed-point scale: pr 1.0 == 10^12
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val ev = eventsWithTs(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
    val hops = ev
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .select(col("src"), col("event_type").as("dst"))
    val edges = hops.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("wgt"))
    val outdeg = edges.groupBy(col("src")).agg(sum(col("wgt")).as("outw"))
    val edgesOut = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("wgt"), col("outw"))
      .localCheckpoint(true) // consumed once per iteration — freeze the
                             // lag-window + double agg instead of re-running it
    val nodes = ev.select(col("event_type").as("node")).distinct()
      .crossJoin(broadcast(
        ev.select(col("event_type")).distinct().agg(count(lit(1)).as("n"))))
      .localCheckpoint(true)
    var pr = nodes.select(col("node"), col("n"), expr(s"${B}L div n").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edgesOut
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"), expr("(pr * wgt) div outw").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("n"),
          (expr(s"(15 * ${B}L) div (100 * n)") +
            expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
    }
    pr.select(col("node").as("event_type"), col("pr").as("pr_fp"),
        round(col("pr").cast(DoubleType) / B, 9).as("pr"))
      .orderBy(col("pr_fp").desc, col("event_type"))
  }

  private def pagerankOracle(iters: Int = 3): String = {
    val B = "1000000000000"
    val steps = (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""c$i AS (SELECT e.dst AS node, CAST(sum((p.pr * e.wgt) // e.outw) AS BIGINT) AS s
         |        FROM ed e JOIN $prev p ON p.node = e.src GROUP BY 1),
         |pr$i AS (SELECT nd.node, nd.n,
         |          CAST((15 * $B) // (100 * nd.n)
         |            + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
         |         FROM nodes nd LEFT JOIN c$i c ON c.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
       |o AS (SELECT event_type, lag(event_type) OVER (
       |        PARTITION BY user_id ORDER BY ts_us, event_id) AS src FROM e),
       |ed0 AS (SELECT src, event_type AS dst, CAST(count(*) AS BIGINT) AS wgt
       |        FROM o WHERE src IS NOT NULL GROUP BY 1, 2),
       |od AS (SELECT src, CAST(sum(wgt) AS BIGINT) AS outw FROM ed0 GROUP BY 1),
       |ed AS (SELECT ed0.src, ed0.dst, ed0.wgt, od.outw FROM ed0 JOIN od USING (src)),
       |n0 AS (SELECT DISTINCT event_type AS node FROM e),
       |nodes AS (SELECT node, (SELECT CAST(count(*) AS BIGINT) FROM n0) AS n FROM n0),
       |pr0 AS (SELECT node, n, CAST($B // n AS BIGINT) AS pr FROM nodes),
       |$steps
       |SELECT node AS event_type, pr AS pr_fp,
       |       ROUND(CAST(pr AS DOUBLE) / $B, 9) AS pr
       |FROM pr$iters ORDER BY pr_fp DESC, event_type""".stripMargin
  }

  private def multimodalJson(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  // sketch-based approximate aggregates next to their exact answers: HLL++
  // distinct counts and T-digest-style quantiles are MERGEABLE, so they
  // combine map-side and ship O(sketch) bytes per group through the
  // shuffle — at 100 TB the difference between a bounded-memory
  // aggregation and a full distinct/sort. No DuckDB oracle (sketch
  // internals are engine-specific); ApproxAggsSpec bounds the error
  // against the exact columns instead.
  //
  // The exact distinct count runs as its OWN aggregation joined back on
  // the (tiny) group keys: fusing countDistinct into the sketch agg makes
  // Spark EXPAND every input row (one copy per distinct group) and drags
  // the percentile buffers through a sort-based fallback — measured 4.6s
  // fused vs ~1.5s split at sf0.1, and at 100 TB the expand doubles
  // shuffle volume. When the invariant gate needs a RANK window (p45/p55)
  // beside the exact median, all exact percentiles come from ONE
  // array-argument Percentile aggregate (each percentile(...) call would
  // buffer the group's values independently).
  private def approxAggs(spark: SparkSession, dir: String,
                         gateCols: Boolean = false): DataFrame = {
    val e = eventsWithTs(spark, dir)
    val exact =
      if (gateCols) expr("percentile(value, array(0.45, 0.5, 0.55))").as("__pcts")
      else expr("percentile(value, 0.5)").as("exact_p50")
    val sketches = e.groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
      exact,
      count(lit(1)).as("n"))
    // NULL keys filtered to keep countDistinct semantics — HLL ignores
    // NULLs, so counting a NULL "user" here would widen |approx - exact|
    // past the gate's bound on data with missing ids
    val exactUsers = e.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
    val joined = sketches.join(exactUsers, Seq("event_type"))
    (if (gateCols)
      joined
        .withColumn("exact_p50", col("__pcts").getItem(1))
        .withColumn("__p45", col("__pcts").getItem(0))
        .withColumn("__p55", col("__pcts").getItem(2))
        .select(col("event_type"), col("approx_users"), col("exact_users"),
          col("approx_p50"), col("exact_p50"), col("n"), col("__p45"), col("__p55"))
    else joined
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        col("approx_p50"), col("exact_p50"), col("n")))
      .orderBy("event_type")
  }

  /** Driver-visible error-bound invariant for the sketch query, judged by
    * the guarantees the sketches actually make: percentile_approx promises
    * RANK accuracy (±1/accuracy), not value accuracy — a value-relative
    * bound would false-fail on gapped/bimodal distributions — so the
    * sketch median must land inside the exact [p45, p55] VALUE window
    * (rank 0.5±0.0001 ⊂ [0.45, 0.55] for any n). HLL++ at rsd=0.02 gets
    * 8% (4σ).
    *
    * The bound CHECK itself is oracle-hashed: the output carries each
    * group's verdict as a boolean column computed from the real sketch
    * values, and — because the sketches honor their guarantees — the
    * DuckDB oracle asserts those columns as literal TRUE next to the
    * independently recomputed exact aggregates. A sketch regression
    * flips a verdict to false and breaks the hash (and the in-query
    * require fails the run loudly first). Sketch internals themselves
    * stay out of the compared columns — they are engine-private. */
  private def approxAggsGated(spark: SparkSession, dir: String): DataFrame = {
    // eager checkpoint: the grouped result is a handful of rows — compute
    // it once, gate and return both read the materialized blocks instead
    // of re-running the sketch aggregation
    val wide = approxAggs(spark, dir, gateCols = true).localCheckpoint(true)
    val bad = wide.filter(
      abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * 0.08 ||
      col("approx_p50") < col("__p45") || col("approx_p50") > col("__p55")).count()
    require(bad == 0,
      s"$bad event-type groups have sketch estimates outside their " +
        "guaranteed bounds (HLL 4-sigma / median outside exact p45-p55) " +
        "— sketch aggregation is broken")
    wide.select(col("event_type"), col("exact_users"),
      round(col("exact_p50"), 6).as("exact_p50"), col("n"),
      (abs(col("approx_users") - col("exact_users")) <=
        col("exact_users") * 0.08).as("users_within_4sigma"),
      (col("approx_p50") >= col("__p45") &&
        col("approx_p50") <= col("__p55")).as("p50_within_rank_window"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_keyed_latest" -> dedupKeyedLatest,
    "events_hourly_agg" -> eventsHourlyAgg,
    "events_resample_ffill" -> ((s: SparkSession, d: String) => eventsResampleFfill(s, d)),
    "retention_cohorts" -> ((s: SparkSession, d: String) => retentionCohorts(s, d)),
    "sessionize_gaps" -> sessionizeGaps,
    "skew_salted_join" -> skewSaltedJoin,
    "approx_aggs" -> approxAggsGated,
    "funnel_steps" -> funnelSteps,
    "pagerank_iter" -> ((s: SparkSession, d: String) => pagerankIter(s, d)),
    "multimodal_json" -> multimodalJson
  )

  val oracles: Map[String, String] = Map(
    "pagerank_iter" -> pagerankOracle(),
    "approx_aggs" ->
      """WITH e AS (SELECT event_type, user_id, value FROM events),
        |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         ROUND(quantile_cont(value, 0.5), 6) AS exact_p50
        |       FROM e GROUP BY event_type),
        |eu AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        |       FROM e WHERE user_id IS NOT NULL GROUP BY event_type)
        |SELECT ex.event_type, eu.exact_users, ex.exact_p50, ex.n,
        |       TRUE AS users_within_4sigma, TRUE AS p50_within_rank_window
        |FROM ex JOIN eu USING (event_type) ORDER BY event_type""".stripMargin,
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, CAST(min(ts_us) AS BIGINT) AS t_view_us
        |       FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t_click_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts_us > t_view_us GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t_purchase_us
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t_click_us GROUP BY e.user_id)
        |SELECT s1.user_id, t_view_us, t_click_us, t_purchase_us,
        |  CAST(1 + CASE WHEN t_click_us IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN t_purchase_us IS NOT NULL THEN 1 ELSE 0 END AS INT) AS furthest_step
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "dedup_keyed_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "events_resample_ffill" -> eventsResampleFfillOracle(),
    "retention_cohorts" -> retentionCohortsOracle,
    "events_hourly_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start_us, event_type,
        |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start_us, event_type""".stripMargin,
    "skew_salted_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sessionize_gaps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id FROM events),
        |m AS (SELECT user_id,
        |        CASE WHEN lag(tu) OVER w IS NULL OR tu - lag(tu) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id))
        |SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "multimodal_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
