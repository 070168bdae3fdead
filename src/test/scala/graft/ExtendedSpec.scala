package graft

import org.apache.spark.sql.functions._

/** Extended operators: as-of correctness on a hand fixture, and the
  * bucketed join's shuffle elimination. */
class ExtendedSpec extends SparkSuite {
  import spark.implicits._

  test("X1: as-of join picks the latest strictly-earlier match") {
    val asof = operators.Extended.x1AsofJoin.fn(spark, sf).cache()
    assert(asof.count() === Tables.orders(spark, sf).count(),
      "left as-of: one output row per probe row")
    // every non-null match is strictly earlier than the probe date
    assert(asof.filter(col("prev_date") >= col("order_date")).count() === 0)
    // rows on a customer's earliest date (and only those) have no match
    val firstDates = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"))
    val nullMatches = asof.filter(col("prev_date").isNull)
      .join(firstDates, Seq("o_custkey"))
    assert(nullMatches.filter(col("order_date") =!= col("first_d"))
      .count() === 0, "only first-date rows may lack a predecessor")
    asof.unpersist()
  }

  test("X5: bucketed co-located join plans with zero Exchange") {
    val df = operators.Extended.x5BucketedJoin.fn(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle; plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      "expected a join in the plan")
    // row parity with the unbucketed join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(df.count() === plain)
  }
}
