package graft

import org.apache.spark.sql.functions._

/** The scale-probe generator must produce a FAITHFUL 10×: row counts
  * scale, join fan-outs don't, dimensions stay fixed. A replica that
  * multiplied fan-outs would make the probe measure a different query
  * (quadratic join growth that isn't real), so this guards the validity
  * of `bench/bench_probe10x.json` itself.
  */
class ScaleUpSpec extends SparkSuite {

  test("replicas scale row counts, preserve fan-outs, fix dimensions") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scaleup-spec").toString
    ScaleUp.run(spark, sf, out, 3)

    def n(d: String, t: String) =
      spark.read.parquet(s"$d/$t.parquet").count()
    // facts scale by the factor, dims don't
    for (t <- Seq("orders", "lineitem", "customer", "events",
        "documents", "embeddings"))
      assert(n(out, t) === 3 * n(sf, t), t)
    for (t <- Seq("region", "nation", "part", "supplier"))
      assert(n(out, t) === n(sf, t), t)

    // fan-out preservation: the histogram of orders-per-customer is the
    // base histogram with every bar 3× as many customers tall — each
    // copy reproduces the base distribution on its own key range
    def histo(d: String): Map[Long, Long] =
      spark.read.parquet(s"$d/orders.parquet")
        .groupBy("o_custkey").count()
        .groupBy("count").agg(count(lit(1)).as("n_cust"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = histo(sf)
    assert(histo(out) === base.map { case (k, v) => k -> 3 * v })

    // join integrity: the scaled fact-fact join yields exactly 3× the
    // base join's rows — key offsets never cross copies
    def joined(d: String) =
      spark.read.parquet(s"$d/lineitem.parquet")
        .join(spark.read.parquet(s"$d/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
    assert(joined(out) === 3 * joined(sf))
  }
}
