package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dml._

/** Property-style algebraic laws for the DML planner (SURVEY.md §5.2):
  * seeded random small tables, invariants that must hold for ANY data.
  * (Plain seeded generation rather than scalacheck's forAll — the
  * scalatest/scalacheck bridge artifact isn't in the offline cache.) */
class MergeLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def randTable(rnd: scala.util.Random, n: Int): Seq[(Long, String, Int)] =
    Seq.fill(n)((rnd.nextInt(16).toLong,
      rnd.alphanumeric.take(6).mkString.toLowerCase, rnd.nextInt(6)))
      .distinctBy(_._1)

  private def cases(seed: Int): Seq[(Seq[(Long, String, Int)], Seq[(Long, String, Int)])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(8)((randTable(rnd, 10), randTable(rnd, 10)))
  }

  test("merge row-count law: |result| = |target| + |source keys not in target|") {
    for ((t, s) <- cases(42)) {
      val merged = MergePlanner.merge(
        t.toDF("customer_id", "name", "rts"), s.toDF("customer_id", "name", "rts"),
        Seq("customer_id"), Seq(UpdateAllClause()), Seq(InsertAllClause()))
      val expected = t.size + s.map(_._1).toSet.diff(t.map(_._1).toSet).size
      assert(merged.count() == expected, s"t=$t s=$s")
    }
  }

  test("guarded merge with always-false guard leaves all target rows unchanged") {
    for ((t, s) <- cases(7)) {
      val merged = MergePlanner.merge(
        t.toDF("customer_id", "name", "rts"), s.toDF("customer_id", "name", "rts"),
        Seq("customer_id"),
        Seq(UpdateClause(Map("name" -> col("s.name")), cond = Some(lit(false)))),
        Seq(InsertAllClause()))
      val targetRows = t.map(r => (r._1, r._2)).toSet
      val mergedPairs = merged.as[(Long, String, Int)].collect().map(r => (r._1, r._2)).toSet
      assert(targetRows.subsetOf(mergedPairs), s"t=$t s=$s")
    }
  }

  test("merge is idempotent when the source carries the values it sets") {
    for ((t, s) <- cases(11)) {
      val source = s.toDF("customer_id", "name", "rts")
      def step(d: org.apache.spark.sql.DataFrame) =
        MergePlanner.merge(d, source, Seq("customer_id"),
          Seq(UpdateAllClause()), Seq(InsertAllClause()))
      val target = t.toDF("customer_id", "name", "rts")
      val once = step(target).orderBy("customer_id", "name")
        .as[(Long, String, Int)].collect().toSeq
      val twice = step(step(target)).orderBy("customer_id", "name")
        .as[(Long, String, Int)].collect().toSeq
      assert(once == twice, s"t=$t s=$s")
    }
  }

  test("delete(p) ∘ delete(p) = delete(p); counts partition by predicate") {
    for ((t, _) <- cases(13)) {
      val target = t.toDF("customer_id", "name", "rts")
      val p = col("rts") >= 3
      val del = MergePlanner.delete(target, p)
      assert(del.count() == t.count(_._3 < 3))
      assert(MergePlanner.delete(del, p).count() == del.count())
    }
  }

  test("equality-delete (anti-join) ≡ copy-on-write filter for key deletes") {
    val rnd = new scala.util.Random(99)
    for ((t, _) <- cases(17)) {
      val delKeys = Seq.fill(5)(rnd.nextInt(16).toLong).distinct
      val target = t.toDF("customer_id", "name", "rts")
      val mor = target.join(delKeys.toDF("customer_id"), Seq("customer_id"), "left_anti")
      val cow = MergePlanner.delete(target, col("customer_id").isin(delKeys: _*))
      assert(mor.orderBy("customer_id", "name").collect().toSeq ==
        cow.orderBy("customer_id", "name").collect().toSeq)
    }
  }
}
