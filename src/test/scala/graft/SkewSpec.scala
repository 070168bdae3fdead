package graft

import org.apache.spark.sql.functions._

/** Scale-posture proof for the dedup family (VERDICT r3 item 6).
  *
  * d2's band self-join and d5's anchor join document their hot-key risk
  * (a boilerplate phrase every doc shares → one band/anchor bucket holds
  * a huge candidate list) as "AQE skew-join territory". This spec makes
  * that deferral checkable: it plants a hot key shaped exactly like a hot
  * anchor bucket — one key carrying 200k rows next to keys carrying a
  * handful — and asserts the runtime SPLITS the skewed partition
  * (SortMergeJoin(skew=true) in the final adaptive plan) instead of
  * serializing the hot bucket into a single straggler task. Thresholds
  * are lowered to make sf-tiny data register as skew; at 100 TB the
  * stock 256 MB threshold plays the same role.
  */
class SkewSpec extends SparkSuite {

  test("AQE splits a hot anchor/band bucket (skew=true) instead of " +
    "serializing it into one task") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // force the sort-merge path (the 100 TB fact-fact shape: neither
      // side broadcastable) and scale skew detection down to test size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      // anchors table with one boilerplate bucket: key 0 on 200k docs,
      // keys 1..999 on a couple of docs each (d5's anchor histogram when
      // every page shares a footer phrase)
      val hot = spark.range(200000)
        .select(col("id").as("doc_id"), lit(0L).as("anchor"))
      val spread = spark.range(2000)
        .select((col("id") + 1000000).as("doc_id"),
          (col("id") % 999 + 1).as("anchor"))
      val anchors = hot.union(spread)
      val probes = spark.range(1000)
        .select(col("id").as("anchor"), (col("id") + 5000000).as("probe_id"))
      val joined = anchors.join(probes, Seq("anchor"))
      // materialize THIS queryExecution (a .count() would plan a separate
      // query, leaving this one un-executed): AQE decides skew splits at
      // runtime, so the final plan exists only after the run
      val qe = joined.queryExecution
      assert(qe.toRdd.count() === 202000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"hot bucket must be split by AQE skew-join, plan was:\n$plan")
    } finally keys.foreach { k =>
      saved(k) match {
        case Some(v) => conf.set(k, v)
        case None => conf.unset(k)
      }
    }
  }
}
