package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM single-query replay — the mechanical drift-attribution
  * closer (VERDICT r10 item 1). The bench's committed-record comparison
  * can flag an outlier but not attribute it: the r10 official session
  * priced `fuzzy_token_join` at 27.3s over four consecutive same-JVM reps
  * (cpu_s 23.0, gc_s 0.0) when the identical binary had measured 1.39s an
  * hour earlier, and the gc/peak columns read that as "real work
  * regression". A fresh child JVM at session end settles it machine-
  * readably: same flags, same data, cold process — if the fresh JVM is
  * fast, the session (JIT state, heap shape, allocator fragmentation) was
  * the cause, case closed; if the fresh JVM is slow too, the machine is
  * genuinely pricing the work that way right now (steal_s then says
  * whether it's the hypervisor).
  *
  * The child warms its query once at sf0.001 (codegen compile off the
  * clock, same policy as the parent's warmup), runs 2 reps at the bench
  * SF, and prints the min on a marker line the parent greps out of the
  * child's stdout. It writes NO artifact files — bench.json ownership
  * stays with the parent.
  */
object BenchOne {

  private val Marker = "GRAFT_BENCH_ONE_RESULT"

  /** Parent side: spawn a fresh JVM running [[main]] for `query`, return
    * its min-rep seconds. Best-effort by design — a sandbox where child
    * spawning fails (no java, classpath undiscoverable, timeout) returns
    * None and the bench artifact simply omits the column entry. */
  def replay(query: String, sfDir: String, cpus: String,
             timeoutSecs: Long = 600): Option[Double] =
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
      // child heap defaults to the parent's max, overridable: the parent
      // JVM is still RESIDENT when the child runs (spark stopped, heap
      // hinted free via System.gc, but pages may linger) — on a
      // memory-tight host size the child down so it can't page-thrash
      // and misreport "fresh JVM slow too" (ADVICE r11)
      val heapMb = sys.env.get("SPARK_GRAFT_BENCHONE_HEAP_MB").map(_.trim)
        .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 256)
        .getOrElse(Runtime.getRuntime.maxMemory() / (1024L * 1024L))
      val cmd = Seq(javaBin, s"-Xmx${heapMb}m", "-cp", childClasspath(),
        // same add-opens set Spark needs on 17+ (sbt passes these to the
        // parent via its fork options; the raw child must carry its own)
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
        "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
        "--add-opens=java.base/java.io=ALL-UNNAMED",
        "--add-opens=java.base/java.net=ALL-UNNAMED",
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.util=ALL-UNNAMED",
        "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
        "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
        "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
        "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
        "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
        "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
        "graft.BenchOne", query, sfDir, cpus)
      val out = new StringBuilder
      val logger = scala.sys.process.ProcessLogger(
        l => { if (l.contains(Marker)) out.append(l).append('\n') },
        l => if (l.contains("ERROR") || l.contains("Exception"))
          System.err.println(s"[bench-one:$query] $l"))
      val proc = scala.sys.process.Process(cmd, new java.io.File(".")).run(logger)
      // bounded wait: a hung child must not wedge the whole bench session
      val done = new java.util.concurrent.CountDownLatch(1)
      var code = -1
      val waiter = new Thread(() => { code = proc.exitValue(); done.countDown() })
      waiter.setDaemon(true); waiter.start()
      if (!done.await(timeoutSecs, java.util.concurrent.TimeUnit.SECONDS)) {
        proc.destroy()
        System.err.println(s"[bench-one:$query] timed out after ${timeoutSecs}s")
        return None
      }
      if (code != 0) {
        System.err.println(s"[bench-one:$query] child exited $code")
        return None
      }
      s"""$Marker \\{"query":"[^"]+","secs":([0-9.eE+-]+)\\}""".r
        .findFirstMatchIn(out.toString).map(_.group(1).toDouble)
    } catch { case e: Throwable =>
      System.err.println(s"[bench-one:$query] spawn failed: ${e.getMessage}")
      None
    }

  /** The child classpath: compiled project classes + the unmanaged Spark
    * jars. Under sbt the parent's java.class.path is just the launcher,
    * so walk the URLClassLoader chain for the real entries and always
    * append the known build layout as a floor. */
  private def childClasspath(): String = {
    val sep = java.io.File.pathSeparator
    val urls = scala.collection.mutable.LinkedHashSet.empty[String]
    var cl: ClassLoader = getClass.getClassLoader
    while (cl != null) {
      cl match {
        case u: java.net.URLClassLoader =>
          u.getURLs.foreach { x =>
            if (x.getProtocol == "file")
              try urls += new java.io.File(x.toURI).getPath
              catch { case _: Exception => () }
          }
        case _ => ()
      }
      cl = cl.getParent
    }
    System.getProperty("java.class.path", "").split(sep)
      .filter(_.nonEmpty).foreach(urls += _)
    urls += new java.io.File("target/scala-2.13/classes").getAbsolutePath
    urls += "/opt/spark/jars/*"
    urls.mkString(sep)
  }

  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = args(1)
    val cpus = if (args.length > 2) args(2) else "4"
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))
    // scratch derby home: the parent session may have left a lock in the
    // repo's metastore_db, and this child must never fight over it
    val scratch = java.nio.file.Files.createTempDirectory("graft_benchone")
    System.setProperty("derby.system.home", scratch.toString)
    val spark = // fork-free local FS via install(): inert off-local (ADVICE r14: fold, not index)
      graft.sources.GraftLocalFileSystem.install(SparkSession.builder())
      .master(s"local[$cpus]")
      .withExtensions(new graft.catalog.GraftSparkSessionExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        scratch.resolve("warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietBenignProbeLogs()
    val warmDir = {
      val p = new java.io.File(sfDir).getParentFile
      val w = new java.io.File(p, "sf0.001")
      if (w.isDirectory) w.toString else sfDir
    }
    try fn(spark, warmDir).count() catch { case _: Throwable => () }
    Bench.sweepBlocks(spark)
    var minSecs = Double.MaxValue
    (1 to 2).foreach { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      minSecs = math.min(minSecs, (System.nanoTime() - t0) / 1e9)
      Bench.sweepBlocks(spark)
    }
    println(s"""$Marker {"query":"$query","secs":${math.rint(minSecs * 1000) / 1000}}""")
    spark.stop()
  }
}
