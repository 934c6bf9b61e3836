package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.EventOps

/** Error bounds for the sketch-based approximate aggregates (no DuckDB
  * oracle — sketch internals are engine-specific, so the exact columns
  * computed in the same query are the reference). */
class ApproxAggsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("approx-aggs-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("HLL distinct within 5% of exact; approx p50 within the value spread") {
    val rows = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxU = r.getAs[Long]("approx_users").toDouble
      val exactU = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approxU - exactU) / exactU <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approxU exact=$exactU")
      val approxP = r.getAs[Double]("approx_p50")
      val exactP = r.getAs[Double]("exact_p50")
      // percentile_approx with accuracy 10000 on a few hundred rows per
      // group returns an actual data value adjacent to the true median
      assert(math.abs(approxP - exactP) <= math.max(1.0, math.abs(exactP) * 0.05),
        s"${r.getAs[String]("event_type")}: p50 approx=$approxP exact=$exactP")
    }
  }

  test("sketches are deterministic across runs (bench/verify stability)") {
    val a = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    val b = EventOps.queries("approx_aggs")(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
