package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank (`ext.EventOps.pagerankIter`): replays the exact
  * integer recurrence in plain Scala from the sf0.001 events fixture and
  * demands bit-identical `pr_fp` — the whole point of the fixed-point
  * formulation is that any correct implementation agrees to the last
  * unit, so the spec tolerates nothing. */
class PagerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val B = 1000000000000L

  private def replay(iters: Int): Map[String, Long] = {
    val ev = graft.ops.Tables.eventsWithTs(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val edges = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      ordered.iterator.zip(ordered.iterator.drop(1))
    }.toSeq.groupBy(identity).map { case ((s, d), hits) => (s, d, hits.size.toLong) }
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = ev.map(_._2).distinct.sorted
    val n = nodes.size.toLong
    var pr = nodes.map(_ -> B / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => (pr(s) * w) / out(s) }.sum
      }
      pr = nodes.map(v =>
        v -> ((15 * B) / (100 * n) + (85 * contrib.getOrElse(v, 0L)) / 100)).toMap
    }
    pr
  }

  test("pagerank_iter: bit-identical to the plain-Scala fixed-point replay") {
    val got = SparkEntry.queries("pagerank_iter")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("pr_fp")).toMap
    val want = replay(iters = 3)
    assert(got == want)
  }

  test("pagerank_iter: mass ≈ 1 (only divisor truncation lost) and all positive") {
    val rows = SparkEntry.queries("pagerank_iter")(spark, dir).collect()
    val prs = rows.map(_.getAs[Long]("pr_fp"))
    assert(prs.forall(_ > 0))
    // damping redistributes mass; floor division loses < 1 unit per
    // div site per iteration — total stays within 0.1% of B here
    val total = prs.sum
    assert(math.abs(total - B) < B / 1000,
      s"pr mass drifted: $total vs $B")
    // descending output contract
    assert(prs.toSeq == prs.toSeq.sorted(Ordering[Long].reverse))
  }
}
