package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Tables._

/** Temporal join operators Spark lacks as built-ins — as-of join and
  * bounded time-range join — expressed as single-shuffle dataflows that
  * survive 100 TB (no per-key driver loops, no unbounded cross products).
  *
  * The reference has no temporal joins (SURVEY.md §2f); these extend the
  * engine the way a training-data / event-analytics pipeline needs:
  * "attach the latest profile snapshot to each example" (as-of) and
  * "count interactions in the preceding window" (range join) are both
  * staples that naive SQL plans as an O(n·m) broadcast-nested-loop.
  *
  * Both operators are pure DataFrame composition, so Catalyst keeps
  * whole-stage codegen and AQE re-planning end to end.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single most recent right row with
    * `rightTs <= leftTs` on the same key (ties at equal ts broken by the
    * highest right `tieBreak`). Returns every left row plus a struct
    * column `asof` of the matched right `payload` columns (null when no
    * right row precedes).
    *
    * Plan: the UNION + running-`last` window form — tag the sides, union
    * them, and carry the latest right payload forward over a window
    * ordered by (ts, side, tieBreak). ONE shuffle on the key; right rows
    * (side 0) sort before left rows (side 1) at equal ts, giving `<=`
    * semantics. A sort-merge formulation would shuffle the same data but
    * needs a custom merge operator; this gets the identical result from
    * codegen'd built-ins.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String, tieBreak: String,
               payload: Seq[String]): DataFrame = {
    val paySchema = StructType(payload.map(p => right.schema(p)))
    val rowSchema = StructType(left.schema.fields)
    val l2 = left.select(
      key.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(paySchema).as("__pay"), lit(0L).as("__tb"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__row")): _*)
    val r2 = right.select(
      key.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__pay"),
        col(tieBreak).cast(LongType).as("__tb"),
        lit(null).cast(rowSchema).as("__row")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("asof",
        last(when(col("__side") === 0, col("__pay")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col("asof"))
  }

  // ---- harness queries -------------------------------------------------

  /** `asof_join`: each purchase event annotated with the most recent view
    * (`view.ts_us <= purchase.ts_us`) by the same user — the view's
    * event_id and value, nulls when the user never viewed before buying.
    * Ties within a microsecond go to the highest view event_id. */
  private def asofJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsWithTs(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    asofJoin(purchases, views, Seq("user_id"),
      leftTs = "ts_us", rightTs = "ts_us", tieBreak = "event_id",
      payload = Seq("event_id", "value"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        col("asof.event_id").as("view_id"), col("asof.value").as("view_value"))
      .orderBy("purchase_id")
  }

  /** `range_join_events`: per purchase, how many clicks (and their summed
    * value) the same user made in the 10 minutes strictly before it.
    * Scale plan: bucket timestamps into window-sized bins; each purchase
    * probes its own bin and the previous one — the range join becomes an
    * EQUI-join on (user, bin) plus a residual range predicate, so it
    * shuffles once on scalar keys instead of nested-looping. The residual
    * lives in the join condition (left join: a post-filter would drop the
    * zero-click purchases). */
  private def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val win = 600000000L // 10 min in µs
    val e = eventsWithTs(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_us"),
        col("event_id").as("c_id"), col("value").as("c_value"))
      .withColumn("c_bin", expr(s"c_us div ${win}L"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("p_bin", expr(s"ts_us div ${win}L"))
      // probe this bin and the previous: every click in [ts-win, ts)
      // lands in exactly one of the two
      .withColumn("probe_bin", explode(array(col("p_bin"), col("p_bin") - 1)))
    val joined = purchases.join(clicks,
      col("c_user") === col("user_id") && col("c_bin") === col("probe_bin") &&
        col("c_us") >= col("ts_us") - win && col("c_us") < col("ts_us"),
      "left")
    joined.groupBy(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_us"))
      .agg(count(col("c_id")).as("n_clicks"),
        sum(col("c_value").cast(DecimalType(30, 2))).cast(DoubleType).as("sum_click_value"))
      .orderBy("purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoinQuery,
    "range_join_events" -> rangeJoinEvents
  )

  val oracles: Map[String, String] = Map(
    // LATERAL top-1 is the textbook oracle formulation of "most recent prior"
    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu FROM events)
        |SELECT p.event_id AS purchase_id, p.user_id, p.tu AS purchase_us,
        |       v.event_id AS view_id, v.value AS view_value
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id, value FROM e v
        |  WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.tu <= p.tu
        |  ORDER BY v.tu DESC, v.event_id DESC LIMIT 1) v ON true
        |ORDER BY purchase_id""".stripMargin,
    "range_join_events" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu FROM events)
        |SELECT p.event_id AS purchase_id, p.user_id, p.tu AS purchase_us,
        |       count(c.event_id) AS n_clicks,
        |       CAST(SUM(CAST(c.value AS DECIMAL(30,2))) AS DOUBLE) AS sum_click_value
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.tu >= p.tu - 600000000 AND c.tu < p.tu
        |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin
  )
}
