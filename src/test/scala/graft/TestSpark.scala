package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // grouped view SQL's brace-glob relations trip a benign
    // FileStreamSink metadata probe that logs a full stack at WARN —
    // quiet that one logger so test logs stay readable (see Bench)
    Bench.quietBenignProbeLogs()
    s
  }
  /** Fresh temp dir for table tests. */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"
}
