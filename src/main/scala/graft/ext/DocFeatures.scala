package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared per-document feature expressions — ONE definition of the
  * heuristic text features so [[TextOps.gopherRules]] (the rule gate)
  * and [[Retrieval.qualityClassifier]] (the model scorer documented as
  * running over "the same document features") cannot silently drift
  * apart under a one-sided edit. All are per-row HOF arithmetic over
  * the token array — map-side, codegen'd, zero shuffle, and every
  * value is an integer or a single per-row double division so DuckDB
  * oracles match bit-exactly.
  *
  * Deliberately NOT shared: the symbol ratio — gopherRules counts
  * ellipses alongside hashes, qualityClassifier's published weights
  * were fit to the hash-only ratio; each defines its own next to a
  * comment naming the difference. */
private[ext] object DocFeatures {
  /** The fixed stopword list both feature sets (and the oracle SQL
    * generators) share. */
  val stops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def sumTokLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)

  def meanTokLen(toks: Column): Column =
    sumTokLen(toks).cast(DoubleType) / size(toks)

  def alphaFrac(toks: Column): Column =
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast(DoubleType) / size(toks)

  def numericFrac(toks: Column): Column =
    size(filter(toks, t => t.rlike("^[0-9]+$"))).cast(DoubleType) / size(toks)

  def stopCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stops: _*)))
}
