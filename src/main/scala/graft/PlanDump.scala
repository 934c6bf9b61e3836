package graft

import org.apache.spark.sql.SparkSession

/** Measurement aid for the optimization rounds (guide §1.3/§7.2): dump
  * `.explain("formatted")` for named queries to files, so plan claims
  * (Exchange counts, join strategies, PushedFilters) are auditable
  * offline. Writes `<outDir>/<name>_<suffix>.txt`.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * NOTE: building a query's DataFrame executes the query body's side
  * effects (table creates/commits) — the dumped plan is the plan of the
  * RETURNED frame, which for lifecycle queries is the final read-back.
  * That is exactly the plan the bench's `count()` pays for LAST; the
  * earlier actions inside the body are measured with ProfileOne instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    new java.io.File(outDir).mkdirs()
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query '$name'")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
          Bench.sweepBlocks(spark)
      }
    }
    spark.stop()
  }
}
