package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Event-time window semantics + partitioned-sink pruning. */
class WindowsAndSinkSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("W1: tumbling window counts partition the input exactly") {
    val total = Tables.events(spark, sf).count()
    val w = operators.Windows.w1Tumbling.fn(spark, sf)
    assert(w.agg(sum("n")).collect().head.getLong(0) === total)
  }

  test("W2: sliding 10m/5m windows cover every event exactly twice") {
    val total = Tables.events(spark, sf).count()
    val w = operators.Windows.w2Sliding.fn(spark, sf)
    assert(w.agg(sum("n")).collect().head.getLong(0) === 2 * total)
  }

  test("W3: session_window merges up to AND AT the gap, splits beyond") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:05:00")), // 5m later: same session
      (1L, ts("2024-01-01 00:15:00")), // exactly 10m later: still MERGES
      (1L, ts("2024-01-01 00:25:01")), // 10m1s later: NEW session
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = df.groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq === Seq((1L, 1L), (1L, 3L), (2L, 1L)))
  }

  test("W4: planted gaps fill by LOCF with exact provenance routing") {
    // two resources, two days, gaps planted at every routing class:
    //  - 'steps' day 1 observes minutes 00:01 (7.0) and 00:03 (9.0):
    //    00:00 is an UNFILLED leading minute (nothing to carry, ever),
    //    00:02 fills locf_same_day with 7.0, 00:04.. fill with 9.0;
    //  - 'steps' day 2 has ONE obs at 00:05 (11.0): minutes 00:00-00:04
    //    fill locf_prev_day with day 1's CLOSE (9.0), the rest same-day;
    //  - 'hr' exists only on day 2 (no day-1 grid rows for it at all).
    // Two same-minute events (4.0 + 5.0 at 00:03) must sum, not race.
    val rows = Seq(
      (0L, ts("2024-03-01 00:01:30"), 1L, "steps", 7.0, "{}"),
      (1L, ts("2024-03-01 00:03:10"), 1L, "steps", 4.0, "{}"),
      (2L, ts("2024-03-01 00:03:40"), 1L, "steps", 5.0, "{}"),
      (3L, ts("2024-03-02 00:05:59"), 1L, "steps", 11.0, "{}"),
      (4L, ts("2024-03-02 00:02:00"), 2L, "hr", 60.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("w4fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Windows.w4GapFill.fn(spark, dir).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)),
        (if (r.isNullAt(2)) null else r.getDouble(2),
          r.getString(3), r.getLong(4))))
      .toMap
    // exact grid accounting: 1440 minutes per (resource, observed day)
    assert(got.size === 3 * 1440, "grid must be 3 resource-days")
    assert(!got.keySet.exists { case (t, m) =>
      t == "hr" && m.before(ts("2024-03-02 00:00:00")) },
      "hr must have no day-1 grid (grid covers OBSERVED days only)")
    def at(t: String, m: String) = got((t, ts(m)))
    assert(at("steps", "2024-03-01 00:00:00") === ((null, "unfilled", 1438L)))
    assert(at("steps", "2024-03-01 00:01:00") === ((7.0, "observed", 1438L)))
    assert(at("steps", "2024-03-01 00:02:00") ===
      ((7.0, "locf_same_day", 1438L)))
    assert(at("steps", "2024-03-01 00:03:00") === ((9.0, "observed", 1438L)),
      "same-minute events must aggregate before the fill")
    assert(at("steps", "2024-03-01 23:59:00") ===
      ((9.0, "locf_same_day", 1438L)))
    assert(at("steps", "2024-03-02 00:00:00") ===
      ((9.0, "locf_prev_day", 1439L)),
      "day 2's leading gap must carry day 1's CLOSING value")
    assert(at("steps", "2024-03-02 00:04:00") ===
      ((9.0, "locf_prev_day", 1439L)))
    assert(at("steps", "2024-03-02 00:05:00") ===
      ((11.0, "observed", 1439L)))
    assert(at("steps", "2024-03-02 00:06:00") ===
      ((11.0, "locf_same_day", 1439L)))
    assert(at("hr", "2024-03-02 00:00:00") === ((null, "unfilled", 1439L)),
      "a resource's first-ever leading minutes have nothing to carry")
    assert(at("hr", "2024-03-02 00:02:00") === ((60.0, "observed", 1439L)))
    assert(at("hr", "2024-03-02 12:00:00") ===
      ((60.0, "locf_same_day", 1439L)))
    // provenance totals reconcile with the planted obs counts
    val byStatus = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byStatus("observed") === 4, "3 steps-minutes + 1 hr-minute")
  }

  test("W5: funnel honors STRICT step ordering — a click before the " +
      "first view never converts, steps/durations are exact") {
    // user 1: full funnel (view 00:00 → click 00:10 → purchase 00:30);
    // user 2: click BEFORE its first view, purchase after the view —
    //   a has-all-three-types or min-per-type funnel would count it at
    //   step 2/3; strict sequencing stops it at step 1;
    // user 3: view → click, never purchases (stops at step 2);
    // user 4: purchase only (never enters the funnel at all).
    val rows = Seq(
      (0L, ts("2024-03-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (1L, ts("2024-03-01 00:10:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-03-01 00:30:00"), 1L, "purchase", 1.0, "{}"),
      (3L, ts("2024-03-01 00:01:00"), 2L, "click", 1.0, "{}"),
      (4L, ts("2024-03-01 00:05:00"), 2L, "view", 1.0, "{}"),
      (5L, ts("2024-03-01 00:06:00"), 2L, "purchase", 1.0, "{}"),
      (6L, ts("2024-03-01 00:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-03-01 00:05:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-03-01 00:02:00"), 4L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("w5fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Windows.w5Funnel.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(got(1) === (("view", 3L, null, null)))
    assert(got(2) === (("click", 2L, 0.666667, 450.0)),
      "user 2's pre-view click must NOT convert; durations avg " +
        "(600 + 300) / 2")
    assert(got(3) === (("purchase", 1L, 0.5, 1200.0)))
  }

  test("W6: cohorts anchor on each user's first-ever day; retention " +
      "counts distinct active users per offset, exactly") {
    // cohort Mar-1: users 1 (active d0, d2 twice — distinct must not
    // double-count) and 2 (d0 only); cohort Mar-2: user 3 (d0, d1).
    val rows = Seq(
      (0L, ts("2024-03-01 08:00:00"), 1L, "view", 1.0, "{}"),
      (1L, ts("2024-03-03 09:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-03-03 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-03-01 12:00:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-03-02 07:00:00"), 3L, "view", 1.0, "{}"),
      (5L, ts("2024-03-03 07:00:00"), 3L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("w6fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Windows.w6Cohort.fn(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size === 4, s"exactly 4 (cohort, offset) cells, got $got")
    assert(got(("2024-03-01", 0L)) === ((2L, 2L, 1.0)))
    assert(got(("2024-03-01", 2L)) === ((1L, 2L, 0.5)),
      "user 1's two Mar-3 events must count once (distinct user-days)")
    assert(got(("2024-03-02", 0L)) === ((1L, 1L, 1.0)))
    assert(got(("2024-03-02", 1L)) === ((1L, 1L, 1.0)))
  }

  test("W7: attribution credits the right touch under both models — " +
      "lookback expiry, same-timestamp tie-break, and untouched " +
      "purchases all route exactly") {
    val rows = Seq(
      // user 1: view then click then purchase → last=click, first=view
      (0L, ts("2024-03-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (1L, ts("2024-03-02 00:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-03-03 00:00:00"), 1L, "purchase", 10.0, "{}"),
      // user 2: click 8 days before the purchase → OUTSIDE the 7-day
      // lookback (last='none') but first-touch still credits it
      (3L, ts("2024-03-01 00:00:00"), 2L, "click", 0.0, "{}"),
      (4L, ts("2024-03-09 00:00:01"), 2L, "purchase", 20.0, "{}"),
      // user 3: purchase with no touch ever → none/none
      (5L, ts("2024-03-01 00:00:00"), 3L, "purchase", 40.0, "{}"),
      // user 4: touch at the SAME timestamp as the purchase with a
      // smaller event_id → orders before it, so it gets the credit
      (6L, ts("2024-03-05 12:00:00"), 4L, "view", 0.0, "{}"),
      (7L, ts("2024-03-05 12:00:00"), 4L, "purchase", 80.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("w7fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Windows.w7Attribution.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("last_touch", "click")) === ((1L, 10.0)))
    assert(got(("last_touch", "none")) === ((2L, 60.0)),
      "the 8-day-old click must NOT earn last-touch credit")
    assert(got(("last_touch", "view")) === ((1L, 80.0)),
      "a same-timestamp touch with smaller event_id counts")
    assert(got(("first_touch", "view")) === ((2L, 90.0)))
    assert(got(("first_touch", "click")) === ((1L, 20.0)),
      "first-touch has no lookback by convention")
    assert(got(("first_touch", "none")) === ((1L, 40.0)))
    assert(got.size === 6)
  }

  test("W8: planted spike/drop days route exactly; early days are " +
      "warmup, never silently normal") {
    // one resource, 6 steady days (1.0/day), then a 10x spike day and
    // a 10x-drop day; days 1-3 must be warmup (0/1/2 prior days)
    val rows = (1 to 6).map { i =>
      (i.toLong, ts(f"2024-03-0$i%01d 12:00:00"), 1L, "steps", 1.0, "{}")
    } ++ Seq(
      (7L, ts("2024-03-07 12:00:00"), 1L, "steps", 10.0, "{}"),
      (8L, ts("2024-03-08 12:00:00"), 1L, "steps", 0.1, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("w8fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Windows.w8Anomaly.fn(spark, dir).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(got("2024-03-01") === ((1000000L, 0L, 0L, "warmup")))
    assert(got("2024-03-03")._4 === "warmup", "2 prior days is warmup")
    assert(got("2024-03-04") === ((1000000L, 3L, 3000000L, "normal")))
    assert(got("2024-03-07") === ((10000000L, 6L, 6000000L, "spike")),
      "10e6 * 6 > 2 * 6e6 must fire the spike")
    // day 8's baseline includes the spike (6*1 + 10 = 16e6 over 7 days)
    assert(got("2024-03-08") === ((100000L, 7L, 16000000L, "drop")),
      "2 * 0.1e6 * 7 < 16e6 must fire the drop")
  }

  test("K17: the evolved lake keeps both layouts physically, the " +
      "unified read loses nothing, and the coarseness cost is real") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = sources.Ingest.k17PartitionEvolution.fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    val lake = s"${sources.Ingest.lakeRoot}/k17_lake"
    // both layouts on disk: day dirs under /day, month dirs under /month
    val dayDirs = new java.io.File(s"$lake/day").listFiles()
      .map(_.getName).filter(_.startsWith("event_date="))
    val monDirs = new java.io.File(s"$lake/month").listFiles()
      .map(_.getName).filter(_.startsWith("event_month="))
    assert(dayDirs.length.toLong === out("day")._1)
    assert(monDirs.length.toLong === out("month")._1)
    // nothing lost across the evolution point
    assert(out("day")._2 + out("month")._2 ===
      Tables.events(spark, sf).count())
    // exact pruning in the day layout; honest over-scan in the month
    // layout (the whole month reads for one day's rows)
    assert(out("day")._3 === out("day")._4)
    assert(out("month")._3 > out("month")._4,
      "a day probe in the month layout must over-scan — if not, the " +
        "coarseness report is vacuous")
    // plan-level: the month predicate classifies as a PARTITION filter
    // on the evolved layout (pruning still works, just coarser)
    val pruned = spark.read.parquet(s"$lake/month")
      .filter(col("event_month") === lit("2024-01"))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "event_month predicate must classify as a PARTITION filter")
  }

  test("K1: partition filter prunes the lake scan (plan-level)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = sources.Ingest.k1PartitionedSink.fn(spark, sf)
    assert(out.inputFiles.length > 1,
      "lake should have multiple date partitions")
    val oneDay = out.select(col("event_date")).distinct()
      .orderBy(col("event_date")).limit(1).collect().head.getDate(0)
    val pruned = spark.read
      .parquet(s"${sources.Ingest.lakeRoot}/k1")
      .filter(col("event_date") === lit(oneDay))
    pruned.collect() // execute so scan metrics are final
    val scan = pruned.queryExecution.executedPlan
      .collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "event_date predicate must classify as a PARTITION filter")
    assert(scan.metrics("numFiles").value < out.inputFiles.length,
      "scan must read only the matching partition's files")
    assert(pruned.count() > 0)
  }

  test("E1: incremental ingest is idempotent (second run writes nothing)") {
    sources.Ingest.e1IngestIncremental.fn(spark, sf).collect()
    val lake = s"${sources.Ingest.lakeRoot}/e1"
    val firstCount = spark.read.parquet(lake).count()
    // replay ONLY the incremental phase against the now-complete lake
    val src = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("event_date"))
    val worklist = src.distinct()
    val existing = spark.read.parquet(lake)
      .select("event_type", "event_date").distinct()
    val missing = worklist.join(existing,
      Seq("event_type", "event_date"), "left_anti")
    assert(missing.count() === 0, "complete lake ⇒ empty work-list")
    assert(spark.read.parquet(lake).count() === firstCount)
  }

  test("K6 compaction: row-identical content at different file counts") {
    val frag = sources.Ingest.k6FragFixture(spark, sf)
    val (nFrag, _) = sources.Ingest.parquetFileStats(frag)
    assert(nFrag === sources.Ingest.K6_FRAG_FILES.toLong)
    def tmp(n: String) = java.nio.file.Files
      .createTempDirectory(s"graft-k6-$n").toString + "/out"
    // two different size targets → different layouts, same rows
    val coarse = sources.Ingest
      .compactEvents(spark, frag, tmp("coarse"), 400L)
    val fine = sources.Ingest
      .compactEvents(spark, frag, tmp("fine"), 100L)
    val (nCoarse, _) = sources.Ingest.parquetFileStats(coarse)
    val (nFine, _) = sources.Ingest.parquetFileStats(fine)
    val rows = Tables.events(spark, sf).count()
    assert(nCoarse === (rows + 399) / 400)
    assert(nFine === (rows + 99) / 100)
    assert(nCoarse < nFine && nFine < nFrag)
    val base = Tables.events(spark, sf)
    for (dir <- Seq(coarse, fine)) {
      val got = spark.read.parquet(dir)
      assert(got.count() === rows)
      assert(got.exceptAll(base).count() === 0)
      assert(base.exceptAll(got).count() === 0)
    }
    // range layout: per-file event_id spans must not overlap — the
    // footer min/max stats stay selective, so key-range predicates
    // still prune files after the rewrite
    val spans = spark.read.parquet(coarse)
      .select(input_file_name().as("f"), col("event_id"))
      .groupBy("f")
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("lo").collect()
    spans.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
        "compacted files must cover disjoint key ranges")
      case _ => ()
    }
  }

  test("K7: retention physically removes expired partitions and keeps the rest intact") {
    val out = sources.Ingest.k7Retention.fn(spark, sf).collect()
    val nBefore = out.head.getLong(3)
    val nDeleted = out.head.getLong(4)
    // the window itself: kept dates = RETENTION_DAYS, and something
    // real was deleted on this fixture (30 distinct dates)
    assert(out.length.toLong === nBefore - nDeleted)
    assert(out.length === sources.Ingest.K7_RETENTION_DAYS)
    assert(nDeleted > 0)
    // the surviving partitions are exactly the newest dates, row-intact
    val keptDates = out.map(_.getDate(0).toLocalDate).toSet
    val srcByDate = graft.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .groupBy("event_date").count().collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(keptDates === srcByDate.keys.toSeq.sorted.takeRight(
      sources.Ingest.K7_RETENTION_DAYS).toSet,
      "kept dates must be exactly the newest RETENTION_DAYS dates")
    out.foreach { r =>
      assert(r.getLong(1) === srcByDate(r.getDate(0).toLocalDate),
        s"surviving partition ${r.getDate(0)} must keep every row")
    }
  }

  test("K9: dynamic overwrite repairs the window, leaves other files byte-stable") {
    val out = sources.Ingest.k9PartitionOverwrite.fn(spark, sf).collect()
    val repairFrom =
      java.time.LocalDate.parse(sources.Ingest.K9_REPAIR_FROM)
    val preserved = out.head.getLong(3)
    val overwritten = out.head.getLong(4)
    // the fixture spans both sides of the repair cutoff, and the
    // physical file-listing counts match the date split exactly — a
    // static overwrite (preserved=0) or a no-op repair (overwritten=0)
    // both fail here
    val dates = out.map(_.getDate(0).toLocalDate)
    assert(preserved === dates.count(_.isBefore(repairFrom)).toLong)
    assert(overwritten === dates.count(!_.isBefore(repairFrom)).toLong)
    assert(preserved > 0 && overwritten > 0)
    // every date's sum equals the CLEAN source sum — the seeded
    // negation is gone from the window and nothing outside it moved
    val srcSums = graft.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .groupBy("event_date")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
        .as("s"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(2) === srcSums(r.getDate(0).toLocalDate),
        s"partition ${r.getDate(0)} must hold clean values after repair")
    }
  }

  test("K11: targeted delete erases hits, drops a fully-deleted " +
      "partition's stale files, and never touches bystanders") {
    import java.sql.Timestamp
    // three planted days: A holds ONLY delete hits (the dynamic-
    // overwrite gotcha — no survivor rows means the rewrite never
    // touches it, so the stale files must be explicitly dropped), B is
    // a partial hit (rewritten), C has no hits (preserved)
    val m = sources.Ingest.K11_DEL_MOD
    val rows = Seq(
      (m, Timestamp.valueOf("2024-05-01 01:00:00"), 1L, "view", 1.0, "{}"),
      (2 * m, Timestamp.valueOf("2024-05-01 02:00:00"), 1L, "view", 2.0, "{}"),
      (1L, Timestamp.valueOf("2024-05-02 01:00:00"), 1L, "view", 3.0, "{}"),
      (2L, Timestamp.valueOf("2024-05-02 02:00:00"), 1L, "view", 4.0, "{}"),
      (3 * m, Timestamp.valueOf("2024-05-02 03:00:00"), 1L, "view", 5.0, "{}"),
      (3L, Timestamp.valueOf("2024-05-03 01:00:00"), 1L, "view", 6.0, "{}"),
      (4L, Timestamp.valueOf("2024-05-03 02:00:00"), 1L, "view", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("k11fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = sources.Ingest.k11TargetedDelete.fn(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // the fully-deleted day is GONE from the read-back (stale files
    // would resurface here as a 2024-05-01 row with the old values)
    assert(out.keySet === Set("2024-05-02", "2024-05-03"),
      s"read-back partitions: ${out.keySet}")
    val (bn, bs, nDel, nRewr, nDrop, nPres) = out("2024-05-02")
    assert((bn, bs) === ((2L, 7.0)), "partial day keeps only survivors")
    assert(out("2024-05-03")._1 === 2L &&
      out("2024-05-03")._2 === 13.0, "bystander day unchanged")
    assert(nDel === 3L, "three planted hits")
    assert(nRewr === 1L && nDrop === 1L && nPres === 1L,
      s"blast radius (rewritten=$nRewr dropped=$nDrop preserved=$nPres)")
  }

  test("K10: failed audit quarantines the batch, pointer never moves, " +
    "published read stays poison-free") {
    val out = sources.Ingest.k10WriteAuditPublish.fn(spark, sf).collect()
    val b2From =
      java.time.LocalDate.parse(sources.Ingest.K10_B2_FROM)
    // columns: event_date, n, sum_value, b1_published, b2_published,
    // b2_null_viol, b2_bound_viol
    assert(out.forall(_.getBoolean(3)), "clean batch must publish")
    assert(out.forall(!_.getBoolean(4)), "poisoned batch must not")
    assert(out.head.getLong(5) > 0 && out.head.getLong(6) > 0,
      "the audit must report non-zero violation counts, not just fail")
    assert(out.forall(_.getDate(0).toLocalDate.isBefore(b2From)),
      "no published date may come from the quarantined window")
    // physical protocol state: the pointer names exactly the published
    // snapshots, and the quarantined staging dir survives WITH its
    // poisoned rows (the audit trail) without leaking into the read
    val lake = s"${sources.Ingest.lakeRoot}/k10_lake"
    val current = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lake, "_CURRENT")), "UTF-8")
    assert(current === "snap-base,snap-001", s"pointer reads '$current'")
    val staged = spark.read.parquet(s"$lake/snap-002")
    assert(staged.filter(col("event_type").isNull).count() ===
      out.head.getLong(5), "quarantined nulls must match the report")
    assert(staged.filter(col("value") < 0).count() ===
      out.head.getLong(6), "quarantined bounds must match the report")
  }

  test("K13: merge applies updates in place, routes inserts (including " +
      "a NEW partition), and leaves bystander partitions' content intact") {
    val out = sources.Ingest.k13MergeUpsert.fn(spark, sf).collect()
    val byDate = out.map(r => r.getDate(0).toString ->
      ((r.getLong(1), r.getDouble(2)))).toMap
    val rep = out.head
    val (nUpd, nIns, nRw, nCr, nPr) = (rep.getLong(3), rep.getLong(4),
      rep.getLong(5), rep.getLong(6), rep.getLong(7))
    assert(nUpd > 0 && nIns > 0 && nCr > 0 && nPr > 0,
      s"fixture must exercise every path: upd=$nUpd ins=$nIns " +
        s"created=$nCr preserved=$nPr")
    val lake = s"${sources.Ingest.lakeRoot}/k13_lake"
    val lakeDf = spark.read.parquet(lake)
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("value"),
        to_date(col("ts")).as("event_date"))
    // a matched key reads its refreshed value IN PLACE (same date)
    val upd = src.filter(col("event_id") % sources.Ingest.K13_UPD_MOD
      === 0).limit(1).collect().head
    val got = lakeDf.filter(col("event_id") === upd.getLong(0))
      .collect()
    assert(got.length === 1, "a matched key appears exactly once")
    assert(got.head.getAs[Double]("value") === upd.getDouble(1) + 1000.0,
      "the update must be applied in place")
    // every insert lands under its offset key, the even half 40 days out
    val insSrc = src.filter(col("event_id") % sources.Ingest.K13_INS_MOD
      === 0).collect()
    val insLake = lakeDf.filter(col("event_id") >=
      sources.Ingest.K13_INS_OFFSET).collect()
      .map(r => r.getAs[Long]("event_id") ->
        r.getAs[java.sql.Date]("event_date")).toMap
    assert(insLake.size === insSrc.length, "every insert must land")
    insSrc.foreach { r =>
      val want =
        if (r.getLong(0) % (2 * sources.Ingest.K13_INS_MOD) == 0)
          java.sql.Date.valueOf(
            r.getDate(2).toLocalDate.plusDays(40))
        else r.getDate(2)
      assert(insLake(r.getLong(0) + sources.Ingest.K13_INS_OFFSET)
        === want, s"insert ${r.getLong(0)} routed to the wrong date")
    }
    // partition arithmetic closes: rewritten + preserved = existing
    val existing = src.select(col("event_date")).distinct().count()
    assert(nRw + nPr === existing,
      "every pre-existing partition is either rewritten or preserved")
    // a bystander (preserved) date's content equals the source exactly
    val affectedDates = out.map(_.getDate(0).toString).toSet
    val srcByDate = src.collect()
      .groupBy(_.getDate(2).toString)
    val preservedDate = srcByDate.keys
      .find(dt => lakeDf.filter(col("event_date") === dt)
        .filter(col("event_id") % sources.Ingest.K13_UPD_MOD === 0)
        .isEmpty && !srcByDate(dt).exists(r =>
          r.getLong(0) % sources.Ingest.K13_INS_MOD == 0 &&
            r.getLong(0) % (2 * sources.Ingest.K13_INS_MOD) != 0))
    preservedDate.foreach { dt =>
      val lakeRows = lakeDf.filter(col("event_date") === dt)
        .select(col("event_id"), col("value")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      val srcRows = srcByDate(dt)
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(lakeRows === srcRows,
        s"bystander partition $dt must be untouched")
    }
  }

  test("K12: rollback flips only the pointer — every snapshot's files " +
    "and the full history survive, AS OF cuts nest exactly") {
    val out = sources.Ingest.k12TimeTravel.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    // the bad batch is genuinely bad, genuinely published at v2, and
    // the rollback genuinely fired
    assert(out("v2")._2 > 0, "v2 must carry the downstream-bad rows")
    assert(out("v0")._2 === 0 && out("v1")._2 === 0,
      "earlier versions must be clean")
    assert(out.values.forall(_._3), "rolled_back must report true")
    // current == v1 (the rollback proof), v0 ⊂ v1 ⊂ v2 (cuts nest)
    assert(out("current")._1 === out("v1")._1 &&
      out("current")._2 === out("v1")._2,
      "post-rollback current must equal v1's cut")
    assert(out("v0")._1 < out("v1")._1 && out("v1")._1 < out("v2")._1,
      "AS OF cuts must nest strictly")
    // physical: pointer flipped to history line 1, history keeps all
    // three lines, and the rolled-back snapshot's part files SURVIVE
    val lake = s"${sources.Ingest.lakeRoot}/k12_lake"
    def readf(n: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lake, n)), "UTF-8")
    val hist = readf("_HISTORY").split("\n")
    assert(hist.toSeq === Seq("snap-base", "snap-base,snap-001",
      "snap-base,snap-001,snap-002"), s"history reads ${hist.toSeq}")
    assert(readf("_CURRENT") === "snap-base,snap-001",
      "rollback must flip the pointer to the prior history line")
    val snap2 = new java.io.File(s"$lake/snap-002").listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(snap2.nonEmpty,
      "the rolled-back snapshot's data files must survive untouched")
    // and v2 stays readable AS OF its history line after the rollback
    val v2n = hist(2).split(",")
      .map(p => spark.read.parquet(s"$lake/$p"))
      .reduce(_ unionByName _).count()
    assert(v2n === out("v2")._1,
      "the rolled-back version must remain readable AS OF its line")
  }

  test("K15: vacuum deletes ONLY the orphan snapshot — live dirs and " +
    "the published read are bit-intact, the orphan is physically gone") {
    val rows = sources.Ingest.k15Vacuum.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // exactly one orphan (the poisoned staged-never-published batch 2),
    // two live snapshots (base + batch 1), and real rows reclaimed
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_snapshots_live")) === 2L)
      assert(r.getLong(r.fieldIndex("n_snapshots_vacuumed")) === 1L)
      assert(r.getLong(r.fieldIndex("rows_vacuumed")) > 0L,
        "the orphan must have held data — vacuum tested nothing")
    }
    val lake = s"${sources.Ingest.lakeRoot}/k15_lake"
    // physical: the orphan dir is gone, the live dirs keep their files
    assert(!new java.io.File(s"$lake/snap-002").exists(),
      "the orphan snapshot directory must be deleted")
    for (snap <- Seq("snap-base", "snap-001")) {
      val parts = new java.io.File(s"$lake/$snap").listFiles()
        .map(_.getName).filter(_.startsWith("part-"))
      assert(parts.nonEmpty, s"live snapshot $snap lost its files")
    }
    // the pointer still names exactly the live set
    val cur = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lake, "_CURRENT")), "UTF-8")
    assert(cur === "snap-base,snap-001", s"pointer reads $cur")
    // and the post-vacuum published read equals an independent re-read
    // of the live dirs (the janitor touched no live data)
    val reread = cur.split(",")
      .map(p => spark.read.parquet(s"$lake/$p"))
      .reduce(_ unionByName _).count()
    assert(reread === rows.map(_.getLong(1)).sum,
      "published rows changed across the vacuum")
  }

  test("K16: expire reclaims ONLY dirs unreachable from retained " +
      "lines — a dir shared with an expired line survives, history " +
      "trims, and the current read is untouched") {
    val out = sources.Ingest.k16ExpireSnapshots.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val lake = s"${sources.Ingest.lakeRoot}/k16_lake"
    // snap-001 was referenced only by expired lines v0/v1 → reclaimed
    assert(out("snap-001").getBoolean(4) === true)
    assert(!new java.io.File(s"$lake/snap-001").exists(),
      "the unreachable snapshot directory must be physically deleted")
    // snap-base appears in expired AND retained lines → MUST survive
    // (the reference-count-by-introducing-version bug would eat it)
    assert(out("snap-base").getBoolean(2) === true, "in an expired line")
    assert(out("snap-base").getBoolean(4) === false)
    assert(new java.io.File(s"$lake/snap-base").listFiles()
      .exists(_.getName.startsWith("part-")),
      "shared snapshot lost its files")
    // history trimmed to exactly the retained lines, newest last
    val hist = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lake, "_HISTORY")), "UTF-8").split("\n")
    assert(hist.toSeq === Seq("snap-base,snap-compact01",
      "snap-base,snap-compact01,snap-002"))
    // AS OF the oldest retained line still reads; the current read
    // over the expired lake equals the full source
    val asOfV2 = hist.head.split(",")
      .map(p => spark.read.parquet(s"$lake/$p"))
      .reduce(_ unionByName _).count()
    assert(asOfV2 > 0)
    val total = Tables.events(spark, sf).count()
    out.values.foreach { r =>
      assert(r.getLong(r.fieldIndex("current_n")) === total,
        "expiry must not change the live row count")
    }
  }
}
