package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every module contributes (name, query, Option[oracleSql]) triples. */
  private def all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    graft.olap.OlapQueries.entries ++
      graft.olap.OlapBizQueries.entries ++
      graft.olap.OlapExtraQueries.entries ++
      graft.olap.OlapCombinatorQueries.entries ++
      graft.olap.OlapStatQueries.entries ++
      graft.olap.OlapSeriesQueries.entries ++
      graft.olap.OlapAnalyticQueries.entries ++
      graft.olap.OlapHypothesisQueries.entries ++
      graft.olap.OlapGeoQueries.entries ++
      graft.kv.KVQueries.entries ++
      graft.graph.GraphQueries.entries ++
      graft.graph.KVGraphQueries.entries ++
      graft.pipeline.DedupQueries.entries ++
      graft.pipeline.AnnQueries.entries ++
      graft.pipeline.TextQueries.entries ++
      graft.pipeline.HygieneQueries.entries ++
      graft.pipeline.PackQueries.entries ++
      graft.pipeline.MediaQueries.entries ++
      graft.pipeline.PipelineQueries.entries ++
      graft.pipeline.BpeTrainer.entries ++
      graft.pipeline.QualityModel.entries ++
      graft.sources.SourceQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.olap.OlapQueries.q5Join5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
