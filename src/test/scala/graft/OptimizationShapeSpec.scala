package graft

import org.apache.spark.sql.functions._

/** r20 optimization round: plan-shape and semantics guards for the
  * operator internals the round changed (the "add a focused test when
  * an optimization changes an operator's internals" rule).
  *
  * These assert the MECHANISM of each optimization, because the
  * committed plans/r20 dumps can only show the final sub-plan (the
  * per-hop localCheckpoints truncate everything upstream):
  *  - one beam hop = broadcast joins only (no SortMergeJoin, no
  *    corpus-side shuffle) and ONE hash exchange feeding both the
  *    dedup agg and the top-beam window;
  *  - the NSW build spreads its pair-scoring join by the bucket key;
  *  - k14's before/tombstoned split derives both phases from one
  *    beam frame and equals the unsplit search exactly;
  *  - spreadScan widens one-split scans and leaves wide frames alone.
  */
class OptimizationShapeSpec extends SparkSuite {
  import spark.implicits._

  // 64 dims like the real embeddings table — the NSW sign key reads
  // elements up to index NSW_KEY_MAX_DIM (63)
  private def emb(id: Long): (Long, Array[Float]) =
    (id, Array.tabulate(64)(i => ((id * 31 + i * 7) % 13 - 6).toFloat))

  private lazy val e = (0L until 64L).map(emb)
    .toDF("vec_id", "emb")

  test("beamHop: broadcast-only joins, one hash exchange shared by " +
      "the dedup agg and the top-beam window") {
    val probes = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
    val edges = e.select(col("vec_id").as("v"),
      ((col("vec_id") + 1) % 64).as("n"))
    val f0 = probes.crossJoin(broadcast(e.limit(4)))
      .select(col("probe_id"), col("vec_id"), lit(0.5).as("sim"))
    val hop = operators.Ann.beamHop(spark, e, probes, f0, edges, 4)
    hop.queryExecution.toRdd.count()
    val p = hop.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("SortMergeJoin"),
      s"beam hop regressed to a shuffle join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"beam hop lost its bounded-side broadcasts:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex <= 1, s"beam hop carries $ex hash exchanges — the " +
      s"probe_id repartition must feed BOTH the agg and the window:\n$p")
  }

  test("nswEdgesFrom: the pair-scoring joins are spread by the bucket " +
      "key (no single-task scan fusion)") {
    val edges = operators.Ann.nswEdgesFrom(spark, e)
    edges.queryExecution.toRdd.count()
    val p = edges.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("hashpartitioning\\(b#".r.findAllIn(p).length >= 3,
      s"NSW build lost its spreadByBucket exchanges (sign a, sign b, " +
        s"long-range):\n$p")
  }

  test("k14 split: nswTopkFrom over one nswFinalBeam equals the " +
      "unsplit masked search, masked and unmasked") {
    val edges = operators.Ann.nswEdgesFrom(spark, e)
    val beam = operators.Ann.nswFinalBeam(spark, e, edges)
    val mask = Some(col("vec_id") % 9 === 8)
    for (m <- Seq(None, mask)) {
      val split = operators.Ann.nswTopkFrom(beam, m)
      val whole = operators.Ann.nswSearchOverMasked(spark, e, edges, m)
      assert(split.collect().toSet === whole.collect().toSet,
        s"split beam diverged from the unsplit search (mask=$m)")
    }
    // the tombstone mask must actually bite: at least one tombstoned
    // id ranks in the unmasked top-K (non-vacuous fixture)
    val unmasked = operators.Ann.nswTopkFrom(beam, None)
      .filter(col("vec_id") % 9 === 8).count()
    assert(unmasked > 0, "fixture vacuous: no tombstoned id in top-K")
  }

  test("spreadScan: widens a one-split scan to defaultParallelism, " +
      "leaves already-wide frames unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("spread_scan_spec").toString
    (0 until 100).toDF("x").coalesce(1).write
      .mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    val p = spark.sparkContext.defaultParallelism
    assert(operators.LlmOps.spreadScan(one).rdd.getNumPartitions === p)
    val wide = one.repartition(p + 3)
    assert(operators.LlmOps.spreadScan(wide).rdd.getNumPartitions
      === p + 3, "spreadScan must not touch already-wide frames")
  }
}
