package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("temporal-joins-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("asofJoin matches the most recent prior right row per key") {
    // trades ← quotes: classic as-of fixture
    val trades = Seq(
      ("A", 10L, 100.0), // after quotes at 5 and 9 → 9 wins
      ("A", 5L, 101.0),  // ties quote ts 5 exactly → <= includes it
      ("A", 3L, 102.0),  // before any quote → null
      ("B", 7L, 200.0),  // B has one quote at 7 → matched
      ("C", 9L, 300.0)   // C has no quotes at all → null
    ).toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 5L, 11L, 1.5),
      ("A", 9L, 12L, 1.7),
      ("B", 7L, 13L, 2.0),
      ("A", 20L, 14L, 9.9) // future quote: never matched
    ).toDF("sym", "t", "qid", "bid")

    val out = TemporalJoins.asofJoin(trades, quotes, Seq("sym"),
      leftTs = "t", rightTs = "t", tieBreak = "qid", payload = Seq("qid", "bid"))
      .select($"sym", $"t", $"asof.qid".as("qid"), $"asof.bid".as("bid"))
      .orderBy("sym", "t").collect()

    val got = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    assert(got === Seq(
      ("A", 3L, -1L, -1.0),
      ("A", 5L, 11L, 1.5),
      ("A", 10L, 12L, 1.7),
      ("B", 7L, 13L, 2.0),
      ("C", 9L, -1L, -1.0)))
  }

  test("asofJoin breaks same-timestamp ties by highest tieBreak") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L))
      .toDF("k", "t", "seq")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"),
      "t", "t", tieBreak = "seq", payload = Seq("seq"))
      .select($"asof.seq").as[Long].collect()
    assert(out.toSeq === Seq(9L))
  }

  test("asofJoin plans one shuffle on the key (no nested loop, no cross)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val right = Seq((1L, 5L, 2L)).toDF("k", "t", "rid")
    val plan = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t", "rid", Seq("rid"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin")) // it's a union+window, not a join
  }

  test("range_join_events residual stays inside the equi-join (no nested loop)") {
    val plan = TemporalJoins.queries("range_join_events")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
