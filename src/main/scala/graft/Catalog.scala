package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's operator surface as named queries. One entry per implemented
  * operator from SURVEY.md §2 (+ the training-data-pipeline extensions);
  * every SQL-expressible entry carries a DuckDB oracle twin for the driver's
  * hash-compare. Column names are aliased identically on both sides.
  */
object Catalog {
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def all: Seq[Q] =
    catalog.RelationalQueries.qs ++
      catalog.DistanceQueries.qs ++
      catalog.VectorQueries.qs ++
      catalog.EngineQueries.qs ++
      catalog.IndexQueries.qs ++
      catalog.TextQueries.qs ++
      catalog.BpeQueries.qs ++
      catalog.DedupQueries.qs ++
      catalog.PipelineQueries.qs ++
      catalog.RetrievalQueries.qs ++
      catalog.CurationQueries.qs ++
      catalog.ProfileQueries.qs ++
      catalog.EmbedQueries.qs ++
      catalog.MultimodalQueries.qs ++
      catalog.TextMatchQueries.qs ++
      catalog.HtmlQueries.qs ++
      catalog.UrlQueries.qs ++
      catalog.MaintenanceQueries.qs ++
      catalog.GraphQueries.qs ++
      catalog.SourceQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
