package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.EventOps

/** Error bounds for the sketch-based approximate aggregates. The
  * oracle-compared output carries the bound-check VERDICT columns (plus
  * the exact aggregates); the raw sketch values stay inside the query —
  * sketch internals are engine-specific. This spec asserts the verdicts
  * hold and the sketches stay deterministic across runs. */
class ApproxAggsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("approx-aggs-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("every group's sketch verdicts hold (HLL 4-sigma, p50 rank window)") {
    val rows = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_within_4sigma"),
        s"${r.getAs[String]("event_type")}: HLL outside 4-sigma bound")
      assert(r.getAs[Boolean]("p50_within_rank_window"),
        s"${r.getAs[String]("event_type")}: approx p50 outside exact [p45, p55]")
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Long]("n") >= r.getAs[Long]("exact_users"))
    }
  }

  test("sketches are deterministic across runs (bench/verify stability)") {
    val a = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    val b = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
