package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock attribution for a single query (guide §1.1/§7.3): runs one
  * query like BenchOne, while a daemon thread samples every live thread's
  * stack at ~5ms and aggregates inclusive sample counts per frame. The
  * report separates the job-submitting driver thread ("main") from task
  * threads ("Executor task launch worker-*"), which is exactly the split
  * the bench's wall-vs-cpu_s gap cannot see: a query whose wall ≫ task
  * cpu is losing time on the DRIVER (planning, commit-protocol file IO,
  * streaming-trigger latches) and the driver thread's hot frames name
  * the culprit.
  *
  * Usage: runMain graft.ProfileOne <query> <sfDir> [topN]
  * Prints the topN hottest (thread-class, frame) rows after the timed rep.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val topN = if (args.length > 2) args(2).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = SparkEntry.queries.getOrElse(query, sys.error(s"unknown '$query'"))
    val spark = // fork-free local FS via install(): inert off-local (ADVICE r14: fold, not index)
      graft.sources.GraftLocalFileSystem.install(SparkSession.builder())
      .master(s"local[$cpus]")
      .withExtensions(new graft.catalog.GraftSparkSessionExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietBenignProbeLogs()
    // warm once at sf0.001 (codegen off the clock), like the bench
    val warmDir = {
      val p = new java.io.File(sfDir).getParentFile
      val w = new java.io.File(p, "sf0.001")
      if (w.isDirectory) w.toString else sfDir
    }
    try fn(spark, warmDir).count() catch { case _: Throwable => () }
    try graft.ext.Similarity.warmSessionBases(spark, sfDir) catch { case _: Throwable => }
    try graft.ext.TextOps.warmSessionBases(spark, sfDir) catch { case _: Throwable => }
    Bench.sweepBlocks(spark)
    // one untimed steady-state rep, then the profiled rep
    fn(spark, sfDir).count()
    Bench.sweepBlocks(spark)

    // frame -> samples, keyed by (threadKind, class.method)
    val counts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = true
    @volatile var samples = 0L
    val profiled = Thread.currentThread()
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        samples += 1
        all.forEach { (t, st) =>
          val isStream = t.getName.contains("stream execution") ||
            t.getName.contains("microBatch")
          if (st.nonEmpty && (t.getState == Thread.State.RUNNABLE ||
              (t eq profiled) || isStream)) {
            val kind =
              if (t eq profiled) "DRIVER"
              else if (isStream) "STREAM"
              else if (t.getName.startsWith("Executor task launch")) "TASK"
              else "OTHER:" + t.getName.take(24)
            // inclusive count of the top 30 frames; dedupe within one stack
            val seen = new java.util.HashSet[String]()
            st.take(30).foreach { f =>
              val key = kind + "  " + f.getClassName + "." + f.getMethodName
              if (seen.add(key))
                counts.merge(key, 1L, (a, b) => a + b)
            }
            // leaf frame with state, for the threads whose WAITING time is
            // the thing being attributed (driver main + stream execution)
            if ((t eq profiled) || isStream) {
              val f = st.head
              counts.merge(kind + "-LEAF  " + f.getClassName + "." + f.getMethodName +
                ":" + f.getLineNumber + " [" + t.getState + "]",
                1L, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    // job/stage/task counters: a wall≫cpu query with thousands of tiny
    // tasks is paying per-task fixed costs (closure+conf deserialization,
    // scheduling), the #1 driver-latency signature on local tiny data
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val deserNanos = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null)
          deserNanos.addAndGet(e.taskMetrics.executorDeserializeTime * 1000000L)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    sampling = false
    sampler.join(1000)
    Thread.sleep(300) // let the listener bus drain
    println(f"PROFILE_ONE query=$query secs=$secs%.3f samples=$samples " +
      f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
      f"taskDeserS=${deserNanos.get / 1e9}%.2f")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2)
      .filter { case (k, _) => !k.startsWith("OTHER") }
      .take(topN)
      .foreach { case (k, v) =>
        println(f"${v.toDouble * 100 / samples}%6.1f%%  $k")
      }
    spark.stop()
  }
}
