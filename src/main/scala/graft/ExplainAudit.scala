import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- Seq("a5_ann_bruteforce", "a6_ann_lsh", "t3_token_topk",
        "w1_window_tumbling", "w3_window_session", "t4_fingerprint",
        "e1_ingest_incremental")) {
      println(s"===================== $name")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
    }
    spark.stop()
  }
}
