package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement tool (guide §1: measure FIRST —
  * empirical view of where the time goes). Runs the named queries under
  * the Bench session shape and, via a SparkListener, reports per query:
  * wall seconds, job count, stage count, task count, summed task time,
  * shuffle read/write bytes — the stage-level truth `.explain` cannot
  * show (the tree printer repeats shared subtrees; AQE decisions only
  * exist post-run). Usage:
  *   runMain Prof <query> [<query> ...]
  * Prints one JSON line per query. Timing methodology matches Bench
  * (full-plan toRdd.count; caches released after each query) so walls
  * are comparable to bench medians, but each query runs ONCE — use for
  * shape, not for pin comparisons.
  */
object Prof {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        if (m.shuffleReadMetrics != null)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        if (m.shuffleWriteMetrics != null)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Prof <query>...")
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
    // same warmup as Bench so the first profiled query isn't charged
    // JVM/codegen startup or fixture builds
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$d/orders.parquet").count()
      sources.Ingest.p4DocsFixture(spark, d)
      sources.Ingest.p4bAzmFixture(spark, d)
      sources.Ingest.s9JsonlFixture(spark, d)
      sources.Ingest.s11GenFixtures(spark, d)
      sources.Ingest.k8cStandingFixture(spark, d)
      sources.Ingest.k8dStandingFixture(spark, d)
    } catch { case _: Throwable => () }
    for (name <- args) {
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      val wall =
        try {
          SparkEntry.queries(name)(spark, d)
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[prof] $name failed: $e"); -1.0 }
      operators.LlmOps.releaseCaches()
      // let straggler listener events drain before reading counters
      // (listenerBus.waitUntilEmpty is private[spark]; a short sleep is
      // enough for a measurement tool)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(acc)
      println(f"""{"name":"$name","wall":$wall%.3f,"jobs":${acc.jobs.get},"stages":${acc.stages.get},"tasks":${acc.tasks.get},"taskTimeSec":${acc.taskTimeMs.get / 1e3}%.2f,"gcSec":${acc.gcMs.get / 1e3}%.2f,"shufReadMB":${acc.shufRead.get / 1e6}%.2f,"shufWriteMB":${acc.shufWrite.get / 1e6}%.2f}""")
    }
    spark.stop()
  }
}
