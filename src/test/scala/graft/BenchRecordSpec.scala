package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.committedRecord's PARSER INVARIANT against the REAL
  * committed artifact: the adaptive-rep reference requires the
  * bench_full.json "queries" object to stay FLAT (name:number pairs) —
  * a shape change (nesting rep lists or io columns inside it) silently
  * disables adaptive reps and outlier attribution rather than failing.
  * This spec parses `git show HEAD:bench_full.json` through the exact
  * production code path and fails loudly if the extraction collapses. */
class BenchRecordSpec extends AnyFunSuite {

  test("committedRecord parses the committed bench_full.json (flat-queries invariant)") {
    val txt =
      try scala.sys.process.Process(
        Seq("git", "show", "HEAD:bench_full.json"), new java.io.File(".")).!!
      catch { case _: Throwable => "" }
    assume(txt.nonEmpty, "no committed bench_full.json / git unavailable")
    val sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    assume(sf.isDefined, "committed record carries no sf field")
    val rec = Bench.committedRecord(sf.get)
    assert(rec.size >= 150,
      s"parser extracted only ${rec.size} per-query records — the flat " +
        "\"queries\" shape (Bench.scala committedRecord) is broken and " +
        "adaptive reps are silently disabled")
    assert(rec.values.forall(v => v > 0 && v < 10000),
      "nonsensical per-query seconds — parser matched the wrong segment")
    // the sf gate: a record minted at another SF must yield NO reference
    // (local small-SF iteration must never chase sf0.1 numbers)
    assert(Bench.committedRecord("/nonexistent/sf9.9").isEmpty)
  }
}
