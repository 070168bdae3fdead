package graft

import org.apache.spark.sql.functions._

/** The native `hll_estimate` typed-imperative aggregate
  * (functions/HllEstimate): equality with a9's relational register
  * pipeline, merge/partitioning invariance, and the ObjectHashAggregate
  * partial-merge plan shape that is its reason to exist. */
class HllAggSpec extends SparkSuite {

  test("a9b native estimate equals a9's relational pipeline exactly") {
    val rel = operators.LlmOps.a9HllDistinct.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(_._1)
    val nat = operators.LlmOps.a9bHllNative.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(_._1)
    assert(nat.nonEmpty)
    assert(nat.toSeq === rel.toSeq,
      "native registers must reproduce the relational estimate bit-for-bit")
  }

  test("a9 estimate tracks the exact per-language cardinality (error exhibit)") {
    // the exact countDistinct used to ride along INSIDE a9 — it was the
    // shuffle the sketch exists to avoid, so it moved here (round 8)
    val est = operators.LlmOps.a9HllDistinct.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.documents(spark, sf)
      .select(col("lang"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(t)-3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("gram"))
      .groupBy("lang").agg(countDistinct(col("gram")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (lang, n) =>
      val err = math.abs(est(lang) - n) / n
      assert(err < 0.2,
        f"$lang: estimate ${est(lang)}%.0f vs exact $n (err $err%.3f; " +
          "expected ≈1.04/sqrt(256) ≈ 6.5%%)")
    }
  }

  test("estimate is invariant under repartitioning (merge correctness)") {
    import spark.implicits._
    val vals = (1L to 5000L).map(i => s"item-$i").toDF("x")
      .select(functions.Portable.h60(col("x"), "hll|").as("h"))
    def est(parts: Int): Double =
      vals.repartition(parts).agg(expr("hll_estimate(h)")).head().getDouble(0)
    val one = est(1)
    assert(est(7) === one, "7-way merge must equal single-partition fold")
    assert(est(32) === one, "32-way merge must equal single-partition fold")
    // and the estimate is actually estimating: within 10% at 5k distinct
    assert(math.abs(one - 5000.0) / 5000.0 < 0.10, s"estimate $one")
  }

  test("duplicates don't move registers: estimate depends on the distinct set") {
    import spark.implicits._
    val base = (1L to 400L).map(i => s"d-$i").toDF("x")
      .select(functions.Portable.h60(col("x"), "hll|").as("h"))
    val dup = base.union(base).union(base)
    assert(dup.agg(expr("hll_estimate(h)")).head().getDouble(0) ===
      base.agg(expr("hll_estimate(h)")).head().getDouble(0))
  }

  test("plan aggregates via ObjectHashAggregate with a partial phase") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
      .select((col("id") % 3).as("g"),
        functions.Portable.h60(col("id").cast("string"), "hll|").as("h"))
      .groupBy("g").agg(expr("hll_estimate(h)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_hll_estimate") ||
      plan.toLowerCase.contains("partial"), // map-side combine present
      plan)
  }

  test("null hashes are ignored, not counted") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), None).toDF("h0")
      .select(when(col("h0").isNotNull,
        functions.Portable.h60(col("h0").cast("string"), "hll|")).as("h"))
    val withNulls = df.agg(expr("hll_estimate(h)")).head().getDouble(0)
    val without = df.filter(col("h").isNotNull)
      .agg(expr("hll_estimate(h)")).head().getDouble(0)
    assert(withNulls === without)
  }
}
