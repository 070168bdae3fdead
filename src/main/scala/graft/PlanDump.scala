package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round deliverable tool: writes `.explain("formatted")`
  * output for the named queries to `<outDir>/<name>_<tag>.txt` — the
  * before/after plan evidence files under plans/r20/ (guide §1: capture
  * the plan shape for every query you touch). Usage:
  *   runMain PlanDump <outDir> <tag> <query> [<query> ...]
  * Runs on the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * AQE on, extensions installed) so the captured plans are the benched
  * plans. The query is EXECUTED first and the final adaptive plan is
  * captured alongside the static formatted plan: with AQE the static
  * plan shows isFinalPlan=false placeholders, and join-strategy /
  * coalescing decisions only exist post-run.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, d)
      val qe = df.queryExecution
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      qe.toRdd.count()
      val finalPlan = qe.executedPlan.toString
        .split("== Initial Plan ==").head
      val text = s"== ${name} ($tag) ==\n\n" +
        "== explain(formatted), pre-execution ==\n" + formatted +
        "\n== final adaptive executed plan ==\n" + finalPlan
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      operators.LlmOps.releaseCaches()
      println(s"[plandump] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
