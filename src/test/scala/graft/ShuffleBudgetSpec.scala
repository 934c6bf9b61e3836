package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-byte regression fence (VERDICT r7 item 5).
  *
  * Wall-clock is environment noise (the round-8 pinned-order A/B replay
  * measured identical binaries swinging individual queries up to 1.6×,
  * HACKING.md "bench drift"); SHUFFLE BYTES are not — for a
  * deterministic query over fixed input they move only when the PLAN
  * moves. This spec executes every `SparkEntry.queries` entry at
  * sf0.001 with a task-metrics listener and compares the per-query
  * shuffle-write bytes against the committed budget table
  * (`src/test/resources/shuffle_budgets_sf0001.tsv`):
  *
  *  - bytes > 2 × budget (+64 KB jitter slack) → FAIL: a join lost its
  *    broadcast, a pre-aggregation vanished, a new shuffle appeared.
  *  - bytes < budget / 2 (−64 KB slack)        → FAIL: the plan
  *    improved (or broke) — re-pin the budget so the fence stays tight.
  *    Same two-sided philosophy as PlanLintSpec's BNLJ allowlist: a
  *    stale generous budget would let a future regression hide.
  *  - query missing a budget line / line naming a dead query → FAIL.
  *
  * Regenerate after a deliberate plan change:
  *   SPARK_GRAFT_REGEN_BUDGETS=1 sbt "testOnly graft.ShuffleBudgetSpec"
  * which rewrites the TSV in place (then commit the diff alongside the
  * plan change — the diff IS the review artifact).
  */
class ShuffleBudgetSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val budgetPath = java.nio.file.Paths.get(
    "src/test/resources/shuffle_budgets_sf0001.tsv")
  private val slack = 64L * 1024

  private val shufWrite = new java.util.concurrent.atomic.AtomicLong

  test("per-query shuffle-write bytes at sf0.001 stay within 2x of committed budgets") {
    val spark = TestSpark.session
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // SETUP, outside any per-query measurement: build the shared
    // session-lifetime base ANN/dedup indexes first, so each lifecycle
    // query's budget prices its steady-state serving plan regardless of
    // execution order — without this the committed budgets of
    // `ann_index_probe`/`dedup_index_probe` etc. assumed another query in
    // the shared JVM paid the base build (ADVICE r13).
    graft.ext.Similarity.warmSessionBases(spark, sfDir)
    graft.ext.TextOps.warmSessionBases(spark, sfDir)
    Bench.sweepBlocks(spark)
    val measured = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      val w0 = shufWrite.get
      try fn(spark, sfDir).count()
      catch { case e: Throwable => fail(s"$name failed to run: ${e.getMessage}") }
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      Bench.sweepBlocks(spark)
      name -> (shufWrite.get - w0)
    }

    if (sys.env.get("SPARK_GRAFT_REGEN_BUDGETS").exists(_.nonEmpty)) {
      val body = measured.map { case (n, b) => s"$n\t$b" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(budgetPath.getParent)
      java.nio.file.Files.write(budgetPath, body.getBytes("UTF-8"))
      info(s"regenerated ${measured.size} budgets at $budgetPath")
    } else {
    assert(java.nio.file.Files.exists(budgetPath),
      s"no budget table at $budgetPath — run with SPARK_GRAFT_REGEN_BUDGETS=1 to create it")
    val budgets: Map[String, Long] =
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(budgetPath)).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, b) = l.split('\t'); n -> b.toLong
        }.toMap

    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    measured.foreach { case (name, bytes) =>
      budgets.get(name) match {
        case None =>
          problems += s"$name: no budget line (measured $bytes) — add `$name\t$bytes`"
        case Some(budget) =>
          if (bytes > 2 * budget + slack)
            problems += s"$name: shuffle grew ${budget}B -> ${bytes}B (>2x) — plan regressed or budget stale"
          if (bytes < budget / 2 - slack)
            problems += s"$name: shuffle shrank ${budget}B -> ${bytes}B (<0.5x) — re-pin the (improved?) budget"
      }
    }
    (budgets.keySet -- measured.map(_._1)).toSeq.sorted.foreach(n =>
      problems += s"$n: budget line names a query that no longer exists")
    assert(problems.isEmpty,
      s"\nshuffle-budget fence:\n  ${problems.mkString("\n  ")}\n" +
        "(deliberate plan change? regenerate: SPARK_GRAFT_REGEN_BUDGETS=1 " +
        "sbt 'testOnly graft.ShuffleBudgetSpec')")
    }
  }
}
