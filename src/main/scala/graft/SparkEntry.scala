package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface: one entry per implemented
  * operator from SURVEY.md §2 (plus the training-data extensions). For each
  * entry with a DuckDB-expressible equivalent, `oracleSql` carries the SQL the
  * driver runs on the same parquet tables for a hash-compare.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.queries.RelationalQueries,
    graft.queries.JoinQueries,
    graft.queries.ScalarWindowQueries,
    graft.queries.TextDedupQueries,
    graft.queries.VectorQueries,
    graft.queries.DqQueries,
    graft.queries.AggBreadthQueries,
    graft.queries.SetSubqueryQueries,
    graft.queries.FunctionBreadthQueries,
    graft.queries.TimeSeriesQueries,
    graft.queries.StatsQueries,
    graft.queries.MultimodalQueries,
    graft.queries.SemiStructuredQueries,
    graft.queries.RangeFrameQueries,
    graft.queries.IntervalJoinQueries,
    graft.queries.LateralQueries,
    graft.queries.CurationQueries,
    graft.queries.DedupGateQueries,
    graft.queries.TrainingPrepQueries,
    graft.queries.WarehouseQueries,
    graft.queries.RetrievalLayoutQueries,
    graft.queries.GraphIncrementalQueries,
    graft.queries.GraphTraversalQueries,
    graft.queries.EntityResolutionQueries,
    graft.queries.InferenceQueries,
    graft.queries.SelectionQueries,
    graft.queries.CorpusBalanceQueries,
    graft.queries.ConcentrationQueries,
    graft.queries.NormalizationQueries,
    graft.queries.SqlSurfaceQueries,
    graft.queries.SourceFormatQueries,
    graft.queries.HigherMomentQueries,
    graft.queries.CorpusModelQueries,
    graft.queries.SimilarityJoinQueries,
    graft.queries.ProfilingQueries,
    graft.queries.FunnelQueries,
    graft.queries.AffinityQueries,
    graft.queries.CurationOpsQueries,
    graft.queries.FrameSemanticsQueries,
    graft.queries.EvalMetricsQueries,
    graft.queries.StreamingGateQueries,
    graft.queries.SketchQueries,
  )

  private lazy val defs: Seq[QueryDef] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
