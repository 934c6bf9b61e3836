package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import graft.streaming.StreamOps

/** Hammers the MV serving law under live churn: while one thread appends
  * content-changing batches to the base (and periodically refreshes the
  * MV through the production fold), a reader loop runs the rewritable
  * GROUP BY. The law: every answer equals the exact recompute at SOME
  * base version inside the query's observation window [v-before,
  * v-after] — i.e. the rewrite may pick the MV or the scan, and either
  * side may be a commit ahead of the other thread, but no interleaving
  * may produce an answer no snapshot ever had (the torn read a
  * stale-serving bug would produce). Batch contents are deterministic,
  * so the per-version expected answers are computed driver-side with
  * exact integer arithmetic. */
class MvFreshnessHammerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  lazy val spark: SparkSession = {
    prior = SparkSession.getDefaultSession
    prior.foreach(_ => {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    })
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftSparkSessionExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = prior.foreach { p =>
    SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
  }

  private val dec18 = DecimalType(18, 2)
  private val Groups = 4
  private val PerBatch = 3

  /** Rows of append batch i: ids [i*PerBatch, (i+1)*PerBatch), group =
    * "g" + id % Groups, v = id (exact at scale 2). */
  private def batchDf(i: Int): DataFrame = {
    import spark.implicits._
    (i * PerBatch until (i + 1) * PerBatch)
      .map(id => (id.toLong, s"g${id % Groups}", BigDecimal(id).setScale(2)))
      .toDF("id", "g", "v")
      .select(col("id"), col("g"), col("v").cast(dec18).as("v"))
  }

  /** Exact expected (g, n, sum) set after k appended batches. */
  private def expectedAfter(k: Int): Set[(String, Long, String)] =
    (0 until k * PerBatch).groupBy(id => s"g${id % Groups}").map { case (g, ids) =>
      (g, ids.size.toLong,
        new java.math.BigDecimal(ids.map(_.toLong).sum).setScale(2).toPlainString)
    }.toSet

  test("answers under concurrent append + refresh churn always equal a recompute at a version in the observation window") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mvh_wh").toString
    GraftCatalog.register(spark, wh, "grafthammer")
    val baseDir = s"$wh/db/hb"
    val mvDir = s"$wh/db/hb_mv"
    val base = GraftTable.create(spark, baseDir, StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("v", dec18))), key = Seq("id"), formatVersion = 2)
    GraftTable.create(spark, mvDir, StructType(Seq(
      StructField("g", StringType), StructField("n", LongType),
      StructField("nn", LongType), StructField("total", DecimalType(28, 2)))),
      key = Seq("g"), formatVersion = 2)
    base.append(batchDf(0)) // v1 = batch 1
    StreamOps.applyMvDeltas(base.changesBetween(0, 1), mvDir, "g", "v", "mvh", 1L)
    base.registerMv("by_g", mvDir, "g", "v") // v2 (content-preserving)
    // base version v maps to appended-batch count: v1 = 1 batch, the
    // registration commit adds one version with no content, appends add
    // one content batch per version after that
    def batchesAt(v: Int): Int = if (v <= 1) v else v - 1

    val Batches = 24
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val folded = new java.util.concurrent.atomic.AtomicInteger(1)
    val appender = new Thread(() => {
      try {
        (1 until Batches).foreach { i =>
          base.append(batchDf(i))
          if (i % 3 == 0) { // periodic production refresh
            val to = base.snapshot.version
            StreamOps.applyMvDeltas(base.changesBetween(folded.get, to), mvDir,
              "g", "v", "mvh", to.toLong)
            folded.set(to)
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    val sql = "SELECT g, count(*) AS n, sum(v) AS s FROM grafthammer.db.hb GROUP BY g"
    appender.start()
    var served = 0
    var scanned = 0
    try {
      while (appender.isAlive) {
        val vb = GraftTable.load(spark, baseDir).snapshot.version
        val df = spark.sql(sql)
        val ans = df.collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).setScale(2).toPlainString)).toSet
        val va = GraftTable.load(spark, baseDir).snapshot.version
        val ok = (vb to va).exists(v => ans == expectedAfter(batchesAt(v)))
        assert(ok, s"answer matches no version in [$vb,$va]: $ans\n" +
          s"candidates: ${(vb to va).map(v => expectedAfter(batchesAt(v)))}")
        if (df.inputFiles.exists(_.contains("hb_mv"))) served += 1 else scanned += 1
      }
    } finally appender.join()
    assert(errors.isEmpty, s"appender failed: ${errors.peek()}")
    // final convergence: fold the unfolded tail, the MV serves the exact
    // final answer (same consumer, base-version batchIds stay monotone)
    val to = base.snapshot.version
    StreamOps.applyMvDeltas(base.changesBetween(folded.get, to), mvDir, "g", "v",
      "mvh", to.toLong)
    val fin = spark.sql(sql)
    assert(fin.inputFiles.exists(_.contains("hb_mv")) &&
      !fin.inputFiles.exists(_.contains("/db/hb/")),
      "converged MV must serve the final answer")
    val finAns = fin.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).setScale(2).toPlainString)).toSet
    assert(finAns == expectedAfter(Batches))
    info(s"hammer: $served MV-served, $scanned scanned answers, all law-consistent")
  }
}
