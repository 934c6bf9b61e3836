package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dml._

/** Unit oracles copied from the reference demos' literal rows — the
  * expected post-states are defined by the reference's own output
  * (SURVEY.md §5: FIXTURES.md A2-A4). */
class MergePlannerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // A2: IcebergSQLMerge.java:17-24
  def target() = Seq(
    (1L, "customer_a", "lastname-1"),
    (2L, "customer_b", "lastname-2")
  ).toDF("customer_id", "name", "lastname")

  test("M2 explicit-clause merge: update key 2, insert key 3") {
    val source = Seq(
      (3L, "customer_c-insert", "lastname-3-insert"),
      (2L, "customer_b-updated", "lastname-2-updated")
    ).toDF("customer_id", "name", "lastname")
    val got = MergePlanner.merge(target(), source, Seq("customer_id"),
      matched = Seq(UpdateClause(Map(
        "name" -> col("s.name"), "lastname" -> col("s.lastname")))),
      notMatched = Seq(InsertClause(Map(
        "customer_id" -> col("s.customer_id"), "name" -> col("s.name"),
        "lastname" -> col("s.lastname")))))
      .orderBy("customer_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "customer_a", "lastname-1"),
      (2L, "customer_b-updated", "lastname-2-updated"),
      (3L, "customer_c-insert", "lastname-3-insert")))
  }

  test("M3 star merge: extra source column ignored pre-evolution") {
    // IcebergSQLMerge.java:50-66 — source has email, 3-col target: runs,
    // email ignored, keys 4 & 5 both insert (no match)
    val source = Seq(
      (4L, "c-insert", "l-insert", "a@b.com"),
      (5L, "b-upd", "l-upd", "b@c.com")
    ).toDF("customer_id", "name", "lastname", "email")
    val got = MergePlanner.merge(target(), source, Seq("customer_id"),
      Seq(UpdateAllClause()), Seq(InsertAllClause()))
      .orderBy("customer_id").as[(Long, String, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 4L, 5L))
    assert(got.find(_._1 == 4L).get._2 == "c-insert")
  }

  test("M3 star merge: missing source column → keep on update, null on insert") {
    // IcebergSQLMerge.java:74-92 — source lacks lastname
    val source = Seq((2L, "b-upd-star"), (6L, "f-ins-star"))
      .toDF("customer_id", "name")
    val got = MergePlanner.merge(target(), source, Seq("customer_id"),
      Seq(UpdateAllClause()), Seq(InsertAllClause()))
      .orderBy("customer_id").collect()
    assert(got.length == 3)
    val row2 = got.find(_.getLong(0) == 2L).get
    assert(row2.getString(1) == "b-upd-star" && row2.getString(2) == "lastname-2")
    val row6 = got.find(_.getLong(0) == 6L).get
    assert(row6.getString(1) == "f-ins-star" && row6.isNullAt(2))
  }

  test("M4 guarded merge: stale source row leaves target untouched") {
    // A3: IcebergSQLMergeAsDeleteInsert.java — guard t.ts < s.ts
    val t = Seq((1L, "customer_a", 1), (2L, "customer_b", 1), (3L, "customer_b", 2))
      .toDF("customer_id", "name", "record_change_timestamp")
    val s = Seq((1L, "c-ins", 1), (2L, "b-upd", 2), (3L, "b-upd", 2))
      .toDF("customer_id", "name", "record_change_timestamp")
    val got = MergePlanner.merge(t, s, Seq("customer_id"),
      Seq(UpdateClause(
        Map("name" -> col("s.name"),
            "record_change_timestamp" -> col("s.record_change_timestamp")),
        cond = Some(col("t.record_change_timestamp") < col("s.record_change_timestamp")))),
      Seq(InsertAllClause()))
      .orderBy("customer_id").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "customer_a", 1),  // guard false (1 < 1) → untouched
      (2L, "b-upd", 2),       // guard true  (1 < 2) → updated
      (3L, "customer_b", 2))) // guard false (2 < 2) → untouched
  }

  test("WHEN MATCHED DELETE removes matched rows") {
    val s = Seq((2L, "x", "y")).toDF("customer_id", "name", "lastname")
    val got = MergePlanner.merge(target(), s, Seq("customer_id"),
      Seq(DeleteClause()), Seq.empty)
      .orderBy("customer_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "customer_a", "lastname-1")))
  }

  test("cardinality violation raises") {
    val s = Seq((2L, "x", "y"), (2L, "z", "w")).toDF("customer_id", "name", "lastname")
    assertThrows[IllegalStateException] {
      MergePlanner.merge(target(), s, Seq("customer_id"),
        Seq(UpdateAllClause()), Seq(InsertAllClause()))
    }
    // duplicates that never hit the target are fine
    val s2 = Seq((9L, "x", "y"), (9L, "x", "y")).toDF("customer_id", "name", "lastname")
    val ok = MergePlanner.merge(target(), s2, Seq("customer_id"),
      Seq(UpdateAllClause()), Seq.empty)
    assert(ok.count() == 2)
  }

  test("M1 delete with conjunctive predicate") {
    // A5: IcebergSQLDelete.java — 5 rows, dup key 1, delete removes exactly 2
    val t = Seq(
      (1L, "customer_a-V1", "l1"), (1L, "customer_a-V3", "l1"),
      (1L, "customer_a-V3", "l2"), (2L, "customer_b", "l2"),
      (3L, "customer_c", "l3")
    ).toDF("customer_id", "name", "lastname")
    val got = MergePlanner.delete(t,
      col("customer_id") === 1 && col("name") === "customer_a-V3")
    assert(got.count() == 3)
    assert(got.filter(col("name") === "customer_a-V3").count() == 0)
  }
}
