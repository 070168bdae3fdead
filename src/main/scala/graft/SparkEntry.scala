package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Flagship.fn(spark, "/root/testdata/sf0.001")

  /** Every registered query group (SURVEY.md §2 + LLM-pipeline ops). */
  private def registry: Seq[Queries.Q] =
    Queries.all ++ operators.LlmOps.all ++ operators.Ann.all ++
      operators.Windows.all ++ operators.Multimodal.all ++
      operators.Extended.all ++ operators.Graph.all ++
      sources.Ingest.all ++ SqlFrontend.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicate name would silently shadow a query in the .toMap —
    // fail loudly instead (ADVICE r2)
    val dup = registry.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names in registry: ${dup.mkString(", ")}")
    registry.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
