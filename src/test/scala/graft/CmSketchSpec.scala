package graft

import org.apache.spark.sql.functions._

/** The native `cm_sketch` typed-imperative aggregate
  * (functions/CmSketch): equality with t12's relational cell table,
  * merge/partitioning invariance, the count-min never-undercount
  * guarantee, and the ObjectHashAggregate partial-merge plan shape that
  * is its reason to exist. */
class CmSketchSpec extends SparkSuite {

  test("t12b native cells equal t12's relational sketch exactly") {
    // compare the full 4×64 cell tables, not just the top-10 probes —
    // a compensating pair of cell errors could cancel in the report
    val cnts = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val rel = cnts
      .select(explode(array((0 until 4).map(i =>
        struct(lit(i).as("depth"),
          (functions.Portable.h60(col("tok"), s"cm$i|") % 64).as("bucket"),
          col("n"))): _*)).as("c"))
      .groupBy(col("c.depth"), col("c.bucket")).agg(sum(col("c.n")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nat = cnts.agg(expr("cm_sketch(tok, n)").as("sk"))
      .select(posexplode(col("sk")).as(Seq("idx", "cnt")))
      .collect().map(r => (r.getInt(0) / 64, (r.getInt(0) % 64).toLong) ->
        r.getLong(1)).toMap
    assert(nat.values.sum === rel.values.sum && rel.nonEmpty)
    // relational table omits empty cells; native carries explicit zeros
    assert(nat.filter(_._2 > 0L) === rel.filter(_._2 > 0L),
      "native cells must reproduce the relational sketch bit-for-bit")
  }

  test("count-min never undercounts: min over probes >= exact, per token") {
    import spark.implicits._
    val toks = (1L to 2000L).map(i => s"tok-${i % 97}").toDF("tok")
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val cells = toks.agg(expr("cm_sketch(tok, n)").as("sk"))
      .select(posexplode(col("sk")).as(Seq("idx", "cnt")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    toks.collect().foreach { r =>
      val (tok, n) = (r.getString(0), r.getLong(1))
      val est = (0 until 4).map(i =>
        cells(i * 64 + graft.functions.CmSketch.bucketForTest(i, tok))).min
      assert(est >= n, s"$tok: estimate $est undercuts exact $n")
    }
  }

  test("sketch is invariant under repartitioning (cell-wise ADD merge)") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (s"w-${i % 311}", 1L)).toDF("tok", "n")
    def cells(parts: Int): Seq[Long] =
      df.repartition(parts).agg(expr("cm_sketch(tok, n)"))
        .head().getSeq[Long](0)
    val one = cells(1)
    assert(cells(7) === one, "7-way merge must equal single-partition fold")
    assert(cells(32) === one, "32-way merge must equal single-partition fold")
    assert(one.sum === 3000L * 4, "every occurrence lands in each depth row")
  }

  test("JVM bucket twin matches the relational Portable.h60 % 64") {
    import spark.implicits._
    val toks = Seq("alpha", "beta", "", "the quick", "日本語", "a|b")
    val rel = toks.toDF("tok").select(col("tok"),
      array((0 until 4).map(i =>
        functions.Portable.h60(col("tok"), s"cm$i|") % 64): _*).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    toks.foreach { t =>
      val jvm = (0 until 4).map(i =>
        graft.functions.CmSketch.bucketForTest(i, t).toLong)
      assert(jvm === rel(t), s"bucket mismatch for '$t'")
    }
  }

  test("plan aggregates via ObjectHashAggregate with a partial phase") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
      .select((col("id") % 3).as("g"), col("id").cast("string").as("tok"),
        lit(1L).as("n"))
      .groupBy("g").agg(expr("cm_sketch(tok, n)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_cm_sketch") ||
      plan.toLowerCase.contains("partial"), plan)
  }
}
