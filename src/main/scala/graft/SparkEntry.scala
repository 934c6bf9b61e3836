package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` is the operator inventory (SURVEY.md §2 reference-parity ops
  * + the training-data-pipeline extension ops); `oracleSql` holds the
  * DuckDB-equivalent SQL for every hash-comparable query. Queries without
  * an oracle entry (signature-based dedup, approximate ANN) get the
  * driver's rows-only check and are covered by unit specs instead. */
object SparkEntry {

  /** Flagship query: the SCD2 merge pipeline (SURVEY.md M5) through the
    * full table layer, on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ops.RefOps.scd2Pipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RefOps.queries ++
      ops.AnalyticsOps.queries ++
      ext.TextOps.queries ++
      ext.CorpusOps.queries ++
      ext.Similarity.queries ++
      ext.EventOps.queries ++
      ext.TemporalJoins.queries ++
      ext.Multimodal.queries ++
      ext.Retrieval.queries ++
      ext.Sampling.queries ++
      ext.StatsOps.queries ++
      ext.FuzzyJoin.queries ++
      streaming.StreamOps.queries

  def oracleSql: Map[String, String] =
    ops.RefOps.oracles ++
      ops.AnalyticsOps.oracles ++
      ext.TextOps.oracles ++
      ext.CorpusOps.oracles ++
      ext.Similarity.oracles ++
      ext.EventOps.oracles ++
      ext.TemporalJoins.oracles ++
      ext.Multimodal.oracles ++
      ext.Retrieval.oracles ++
      ext.Sampling.oracles ++
      ext.StatsOps.oracles ++
      ext.FuzzyJoin.oracles ++
      streaming.StreamOps.oracles
}
