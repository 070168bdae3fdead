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

  test("sketch aggregates: approx_count_distinct / percentile_approx bounds") {
    // approximate forms aren't oracle-checkable (HLL/KLL internals
    // differ across engines) — pin their error bounds against the exact
    // forms instead
    val o = Tables.orders(spark, sf)
    val Array(exact, approx) = o
      .agg(countDistinct(col("o_custkey")).cast("double"),
        approx_count_distinct(col("o_custkey")).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx_count_distinct off by >5%: $approx vs $exact")
    val Array(p50exact, p50approx) = o
      .agg(expr("percentile(o_totalprice, 0.5)"),
        expr("percentile_approx(o_totalprice, 0.5, 1000)"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(p50approx - p50exact) / p50exact < 0.05,
      s"percentile_approx median off by >5%: $p50approx vs $p50exact")
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

  test("X7: unpivot expands map-side (one Expand, no extra scan) and balances") {
    val df = operators.Extended.x7Unpivot.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"native unpivot should plan an Expand:\n$plan")
    // 4 measures per UNION-free scan: the fact table is read exactly once
    assert("FileScan parquet".r.findAllIn(plan).size === 1, plan)
    val rows = df.collect()
    val li = Tables.lineitem(spark, sf)
    val nLi = li.count()
    // every (flag, measure) cell counts exactly its flag's row count
    val flagCounts = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === flagCounts.size * 4)
    rows.foreach { r =>
      assert(r.getLong(2) === flagCounts(r.getString(0)),
        s"cell ${r.getString(0)}/${r.getString(1)}")
    }
    assert(rows.map(_.getLong(2)).sum === nLi * 4)
  }

  test("X8: pivot yields 0 (not NULL) for an empty cell, one scan, cells-only shuffles") {
    // adversarial fixture: no (B, O) rows at all — real TPC-H
    // distributions have empty returnflag×linestatus cells, and SQL's
    // count(*) FILTER yields 0 there while Spark's pivotfirst yields NULL
    val fixture = Seq(
      ("A", "F", 10.0), ("A", "F", 20.0), ("A", "O", 5.0), ("B", "F", 7.0))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val out = operators.Extended.pivotFlags(fixture)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("B").getLong(3) === 0L, "empty (B,O) count must be 0")
    assert(out("B").isNullAt(4), "empty (B,O) sum stays NULL (SQL parity)")
    assert(out("A").getLong(1) === 2L && out("A").getLong(3) === 1L)
    // plan shape: pinned pivot values ⇒ no distinct-discovery job; one
    // scan feeds a (group,value) pre-aggregate then a pivotfirst rotate —
    // two exchanges, each carrying only |groups|×|values| cells
    val df = operators.Extended.x8Pivot.fn(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size === 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert("partial_pivotfirst".r.findAllIn(plan).nonEmpty,
      "map-side pivot partials expected")
  }

  test("X9: SCD2 history plans a single Exchange and single Sort") {
    val df = operators.Extended.x9Scd2.fn(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"both window passes must share one partitioning:\n$plan")
    assert("Sort \\[".r.findAllIn(plan).size === 1,
      s"change-detect filter preserves ordering; second Sort is waste:\n$plan")
    // semantic spot-checks: versions are dense per user, exactly one
    // current row per user, and intervals chain (valid_to == next
    // valid_from)
    val byUser = df.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"), max(col("version")).as("maxv"),
      sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
    assert(byUser.filter(col("n") =!= col("maxv") || col("cur") =!= 1)
      .count() === 0, "dense versions and exactly one open interval")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("version"))
    val chained = df.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from"))
    assert(chained.count() === 0, "intervals must chain without gaps")
  }

  test("X10: cube lattice is consistent and plans one Expand + one scan") {
    val df = operators.Extended.x10Cube.fn(spark, sf)
    val rows = df.collect()
    // every grouping set present, and the lattice is self-consistent:
    // each level's counts sum to the grand total
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L), "all four grouping sets")
    val grand = byGid(3L).map(_.getLong(3)).sum
    for (gid <- Seq(0L, 1L, 2L))
      assert(byGid(gid).map(_.getLong(3)).sum === grand,
        s"gid=$gid cell counts must sum to the grand total")
    // rolled-up cells carry NULL group values; detail cells never do
    assert(byGid(3L).forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(byGid(0L).forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    // plan: one scan, one Expand (4x BEFORE the shuffle), one exchange —
    // map-side partials collapse each grouping set to cells per mapper
    df.count()
    // final adaptive plan only — the "== Initial Plan ==" echo repeats
    // every node and would double the counts
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("Expand"), s"cube should plan one Expand:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("X13: grouping sets equal the 4-way union recompute; one Expand," +
    " one grouping shuffle") {
    import org.apache.spark.sql.functions._
    val df = operators.Extended.x13GroupingSets.fn(spark, sf)
    // columns: nation_name, priority, yr, gid, n, price_c100
    val rows = df.collect().map(r => (Option(r.getString(0)),
      Option(r.getString(1)), Option(r.get(2)).map(_ => r.getLong(2)),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // independent recompute: four separate groupBys over the same
    // enriched frame, unioned — the semantics GROUPING SETS must equal
    val o = Tables.orders(spark, sf).select(col("o_custkey"),
      col("o_orderpriority").as("priority"),
      year(to_date(col("o_orderdate"))).cast("long").as("yr"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"))
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name").as("nation_name"))
    val e = o.join(c.join(n, col("c_nationkey") === col("n_nationkey")),
      col("o_custkey") === col("c_custkey"))
      .select(col("nation_name"), col("priority"), col("yr"),
        col("price_c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    def agg(key: ((String, String, Long, Long)) =>
        (Option[String], Option[String], Option[Long]), gid: Long) =
      e.groupBy(key).map { case (k, rs) =>
        (k._1, k._2, k._3, gid, rs.length.toLong, rs.map(_._4).sum) }
    val want = (
      agg(t => (Some(t._1), None, Some(t._3)), 2L) ++
        agg(t => (None, Some(t._2), Some(t._3)), 4L) ++
        agg(t => (None, None, Some(t._3)), 6L) ++
        agg(_ => (None, None, None), 7L)).toSet
    assert(rows === want)
    // plan shape: exactly one Expand and one grouping shuffle — not a
    // per-set re-scan/re-shuffle union
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("Expand"), s"grouping sets must Expand:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert("BroadcastExchange".r.findAllIn(plan).size >= 1,
      s"the dim join must broadcast:\n$plan")
  }

  test("X14: per-column stats are exact on planted nulls/extremes and " +
      "the HLL NDV tracks the exact distinct count") {
    import java.sql.Timestamp
    // 400 rows: l_orderkey dense 0..399 (NDV 400), l_partkey cycles
    // 0..19 (NDV 20) with 25 planted NULLs, l_linenumber constant
    // (NDV 1), l_returnflag in {A,N,R}, l_shipdate spans a known range
    val rows = (0 until 400).map { i =>
      (i.toLong,
        if (i % 16 == 0) None else Some((i % 20).toLong),
        1, Seq("A", "N", "R")(i % 3),
        Timestamp.valueOf(f"2023-01-${1 + i % 28}%02d 00:00:00"))
    }
    val dir = java.nio.file.Files.createTempDirectory("x14fix").toString
    rows.toDF("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = operators.Extended.x14TableStats.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5)))).toMap
    assert(out.keySet === Set("l_orderkey", "l_partkey", "l_linenumber",
      "l_returnflag", "l_shipdate"))
    out.values.foreach { case (n, _, _, _, _) => assert(n === 400L) }
    val (_, okNulls, okMin, okMax, okNdv) = ("", out("l_orderkey")._2,
      out("l_orderkey")._3, out("l_orderkey")._4, out("l_orderkey")._5)
    assert(okNulls === 0L && okMin === "0" && okMax === "399")
    // dense-400 through a 256-register sketch: within the ~1.04/sqrt(m)
    // error envelope (HllAggSpec pins the estimator itself; this pins
    // the per-column plumbing)
    assert(math.abs(okNdv - 400.0) / 400.0 < 0.15, s"orderkey ndv $okNdv")
    val pk = out("l_partkey")
    assert(pk._1 === 400L && pk._2 === 25L,
      s"planted null count must be exact: $pk")
    assert(pk._3 === "0" && pk._4 === "19")
    assert(math.abs(pk._5 - 20.0) < 2.0,
      s"small-range NDV must hit linear counting: ${pk._5}")
    // linear counting at V=255 empty registers: m·ln(m/255) ≈ 1.002
    assert(math.abs(out("l_linenumber")._5 - 1.0) < 0.01,
      s"constant column NDV ~1: ${out("l_linenumber")._5}")
    val rf = out("l_returnflag")
    assert(rf._3 === "A" && rf._4 === "R" && math.abs(rf._5 - 3.0) < 0.5)
    val sd = out("l_shipdate")
    assert(sd._3 === "2023-01-01" && sd._4 === "2023-01-28",
      s"date min/max must canonicalize: $sd")
  }

  test("X11: z-order buckets let a second-dimension predicate skip; linear ones don't") {
    // column order: bucket, n, pk_lo, pk_hi, sk_lo, sk_hi, variant
    val rows = operators.Extended.x11Zorder.fn(spark, sf).collect()
    def skipFrac(variant: String, lo: Long, hi: Long): Double = {
      val bs = rows.filter(_.getString(6) == variant)
      val skipped = bs.count(r =>
        r.getLong(5) < lo || r.getLong(4) > hi) // sk_hi < lo || sk_lo > hi
      skipped.toDouble / bs.length
    }
    // a pruner with predicate l_suppkey IN [8, 9]: which buckets'
    // [sk_lo, sk_hi] can be skipped entirely? (sf0.001 has only 10
    // distinct suppkeys, so the curve's clustering is at its weakest
    // here — the margin grows with the key domain at real scale)
    val zSkip = skipFrac("zorder", 8, 9)
    val linSkip = skipFrac("linear", 8, 9)
    assert(zSkip >= 0.4,
      s"z-order must skip a large bucket share on the second dim (got $zSkip)")
    assert(zSkip >= linSkip + 0.3,
      s"z-order must skip far more than linear ($zSkip vs $linSkip)")
    // both variants partition the table completely and identically in size
    val sizes = rows.groupBy(_.getString(6)).view.mapValues(_.map(_.getLong(1)).sum)
    assert(sizes("zorder") === sizes("linear"))
  }

  test("X15: equi-height histogram bins tile each column in order, " +
      "sample and estimate totals reconcile, and the sample is " +
      "deterministic") {
    val nRows = Tables.lineitem(spark, sf).count()
    def run() = operators.Extended.x15HistogramStats.fn(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val got = run().toMap
    val byCol = got.groupBy(_._1._1)
    assert(byCol.keySet === Set("l_quantity", "l_extendedprice"))
    byCol.foreach { case (c, cells) =>
      val bins = cells.toSeq.sortBy(_._1._2)
      assert(bins.map(_._1._2) === (1L to 8L), s"$c: 8 contiguous bins")
      val sampleTotal = bins.map(_._2._1).sum
      assert(sampleTotal === math.min(4096L, nRows),
        s"$c: fixed-size sample")
      // ntile balance: heights differ by at most 1
      val hs = bins.map(_._2._1)
      assert(hs.max - hs.min <= 1, s"$c: equi-height violated: $hs")
      // bins tile the domain in order (a value split across adjacent
      // bins makes hi(k) == lo(k+1); inversion is a bug)
      bins.foreach { case ((_, b), (_, lo, hi, _)) =>
        assert(lo <= hi, s"$c bin $b: lo > hi") }
      bins.sliding(2).foreach {
        case Seq((_, (_, _, hi1, _)), ((_, b2), (_, lo2, _, _))) =>
          assert(hi1 <= lo2, s"$c: bin ${b2 - 1} hi must be <= bin $b2 lo")
        case _ => ()
      }
      // the per-bin row estimates add back up to the table (each bin is
      // rounded to 2dp, so allow the accumulated rounding only)
      val est = bins.map(_._2._4).sum
      assert(math.abs(est - nRows) <= 0.01 * 8,
        s"$c: estimates must reconcile to n_rows ($est vs $nRows)")
    }
    // the hash-ranked sample (and so the whole report) is deterministic
    assert(run().toMap === got, "re-run must reproduce bit-identically")
  }

  test("X16: every constraint fires on a planted broken lake with " +
      "exact violation counts, and the real lake passes clean") {
    import java.sql.{Date => SqlDate, Timestamp}
    // broken lake: dup PK (2 extra copies), 1 orphan FK row, 1 null
    // date, 1 negative price, 1 bad status, 1 future event
    val dir = java.nio.file.Files.createTempDirectory("x16fix").toString
    Seq(
      (1L, 1, 5.0), (1L, 1, 5.0), (1L, 1, 5.0), // PK triplicate
      (1L, 2, 99.0), // quantity out of range
      (777L, 1, 3.0) // orphan orderkey
    ).toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(
      (1L, SqlDate.valueOf("2024-01-01"), 10.0, "O"),
      (2L, null.asInstanceOf[SqlDate], 20.0, "F"),
      (3L, SqlDate.valueOf("2024-01-03"), -1.0, "X")
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (0L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 1.0,
        "{}"),
      (1L, Timestamp.valueOf("2031-06-01 00:00:00"), 1L, "view", 1.0,
        "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = operators.Extended.x16DataQuality.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size === 7, "all seven checks must report")
    assert(got(("pk_unique", "lineitem(l_orderkey,l_linenumber)")) ===
      ((5L, 2L, false)), "3 copies of one key = 2 violations")
    assert(got(("value_range", "lineitem.l_quantity in [1,50]")) ===
      ((5L, 1L, false)))
    assert(got(("fk_exists", "lineitem.l_orderkey -> orders")) ===
      ((5L, 1L, false)))
    assert(got(("not_null", "orders.o_orderdate")) === ((3L, 1L, false)))
    assert(got(("value_range", "orders.o_totalprice >= 0")) ===
      ((3L, 1L, false)))
    assert(got(("accepted_values", "orders.o_orderstatus in (O,F,P)"))
      === ((3L, 1L, false)))
    assert(got(("no_future_ts", "events.ts < 2030-01-01")) ===
      ((2L, 1L, false)))
    // the real testdata lake: the generator draws l_linenumber at
    // random, so the TPC-H PK contract GENUINELY fails there — the
    // suite's value is that it says so with an exact count — while the
    // other six contracts hold
    val real = operators.Extended.x16DataQuality.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4))))
    assert(real.length === 7)
    val (pk, rest) = real.partition(_._1 == "pk_unique")
    assert(pk.head._2._1 > 0L && !pk.head._2._2,
      "the generated lineitem has duplicate (orderkey, linenumber) " +
        "pairs — the check must report them, not rubber-stamp")
    assert(rest.forall { case (_, (v, p)) => p && v === 0L },
      "every other contract holds on the generated lake")
  }

  test("X17: register-max merge equals a from-scratch sketch of the " +
      "union EXACTLY, counts add, and the merge is monotone") {
    import graft.functions.Portable
    val got = operators.Extended.x17IncrementalStats.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.keySet === Set("l_returnflag", "l_partkey"))
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    got.values.foreach { case (ns, nb, nm, s, b, m) =>
      assert(ns + nb === total && nm === total, "exact counts add")
      // register-max merge can only RAISE registers → the estimate is
      // monotone in each input
      assert(m >= math.max(s, b) - 1e-9, s"merge not monotone: $got")
    }
    // the algebra itself: merged registers == registers of the union,
    // so the merged estimate must equal a FROM-SCRATCH sketch of all
    // rows bit-for-bit (this is what lets the nightly job skip the
    // standing rescan)
    val allHashes = li.select(explode(array(
        struct(lit("l_returnflag").as("c"),
          Portable.h60(col("l_returnflag"), "x17|").as("h")),
        struct(lit("l_partkey").as("c"),
          Portable.h60(col("l_partkey").cast("string"), "x17|")
            .as("h")))).as("e"))
      .select("e.c", "e.h")
    val scratch = operators.LlmOps.hllByKey(allHashes, "c").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (c, (_, _, _, _, _, m)) =>
      assert(m === scratch(c),
        s"$c: incremental merge must equal the from-scratch sketch")
    }
    // the low-NDV column reads (near-)exact under linear counting
    val (_, _, _, _, _, flagNdv) = got("l_returnflag")
    assert(flagNdv >= 2.5 && flagNdv <= 3.5,
      s"l_returnflag has 3 values; sketch read $flagNdv")
  }

  test("X18: the merged KMV sample's quantiles equal a from-scratch " +
      "bottom-K of ALL rows — the mergeability that skips the rescan") {
    import graft.functions.Portable
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
      .map { case (f, ok, ln, v) =>
        (f, ok, ln, v, Portable.h60Jvm(s"x18|$ok|$ln"))
      }
    def bottomK(rs: Seq[(String, Long, Int, Double, Long)]) =
      rs.groupBy(_._1).view.mapValues(
        _.sortBy(t => (t._5, t._4, t._2, t._3)).take(64)).toMap
    def typ1(sample: Seq[(String, Long, Int, Double, Long)],
        pct: Int): Double = {
      val sorted = sample.sortBy(t => (t._4, t._5))
      val n = sorted.size
      val rank = if (pct == 50) (n + 1) / 2 else (9 * n + 9) / 10
      sorted(rank - 1)._4
    }
    val scratch = bottomK(rows)
    val got = operators.Extended.x18IncrementalQuantiles.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(7), r.getDouble(8)))).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    got.foreach { case (f, (ns, nb, p50m, p90m)) =>
      assert(ns + nb === rows.count(_._1 == f).toLong, s"$f counts")
      // merged bottom-K == from-scratch bottom-K (the algebra), so the
      // type-1 picks must be bit-identical
      assert(p50m === typ1(scratch(f), 50), s"$f p50 merge != scratch")
      assert(p90m === typ1(scratch(f), 90), s"$f p90 merge != scratch")
      assert(p50m <= p90m, s"$f quantiles out of order")
    }
  }

  test("x19: count-min join-size estimates replay driver-side, " +
      "bound exact truth from above, and the self-join F2 reads skew") {
    import graft.functions.Portable
    import graft.operators.LlmOps.{CM_W, CM_D}
    // independent replay on the real lake: exact Σ degA·degB from
    // collected key frequencies; sketch estimate from CM_D seeded
    // h60 rows, min across rows — plain Scala maps, no Spark reuse
    def freqs(keys: Seq[Long]): Map[Long, Long] =
      keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def sketch(f: Map[Long, Long]): Map[(Int, Long), Long] = {
      val m = scala.collection.mutable.Map.empty[(Int, Long), Long]
      for ((k, n) <- f; i <- 0 until CM_D) {
        val b = Portable.h60Jvm(s"cm$i|$k") % CM_W
        m((i, b)) = m.getOrElse((i, b), 0L) + n
      }
      m.toMap
    }
    def est(fa: Map[Long, Long], fb: Map[Long, Long]): Long = {
      val (sa, sb) = (sketch(fa), sketch(fb))
      (0 until CM_D).map { i =>
        sa.collect { case ((d0, b), ca) if d0 == i =>
          ca * sb.getOrElse((i, b), 0L) }.sum
      }.min
    }
    def exact(fa: Map[Long, Long], fb: Map[Long, Long]): Long =
      fa.map { case (k, ca) => ca * fb.getOrElse(k, 0L) }.sum
    val li = Tables.lineitem(spark, sf)
    val supp = freqs(li.select("l_suppkey").collect().map(_.getLong(0)))
    val lio = freqs(li.select("l_orderkey").collect().map(_.getLong(0)))
    val ok = freqs(Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)))
    val expected = Map(
      "lineitem.l_suppkey self-join (F2)" ->
        ((exact(supp, supp), est(supp, supp))),
      "lineitem JOIN orders ON orderkey" ->
        ((exact(lio, ok), est(lio, ok))))
    val got = operators.Extended.x19JoinSizeSketch.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    for ((pair, (ex, es)) <- expected) {
      val (gx, ge, over) = got(pair)
      assert(gx === ex, s"$pair exact diverges from replay")
      assert(ge === es, s"$pair estimate diverges from replay")
      assert(over === ge - gx)
      assert(ge >= gx,
        s"$pair: CM inner product must bound truth from above")
    }
    // non-vacuity: the F2 truth must exceed the row count (real skew —
    // every repeated suppkey contributes quadratically), and at 64
    // buckets over thousands of keys the estimate must actually
    // overcount (collisions exist), so the error column is exercised
    val n = li.count()
    assert(expected("lineitem.l_suppkey self-join (F2)")._1 > n,
      "F2 must read the suppkey skew, not the row count")
    assert(got.values.exists(_._3 > 0L),
      "some arm must show a real collision overcount")
  }

  test("x20: bloom-pruned join replays driver-side — passes are a " +
      "superset of true matches, false positives visible, and the " +
      "pruned path loses no join rows or revenue") {
    import graft.functions.Portable
    import graft.operators.LlmOps.{BLOOM_M, BLOOM_K}
    val dimKeys = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "P")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val factKeyRows = Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    val fKeys = factKeyRows.toSet
    val bits = dimKeys.flatMap(k =>
      (0 until BLOOM_K).map(j => Portable.h60Jvm(s"xj$j|$k") % BLOOM_M))
    val pass = fKeys.filter(k => (0 until BLOOM_K).forall(j =>
      bits(Portable.h60Jvm(s"xj$j|$k") % BLOOM_M)))
    val truth = fKeys.intersect(dimKeys)
    val got = operators.Extended.x20BloomJoinPrune.fn(spark, sf)
      .collect().head
    assert(got.getLong(0) === fKeys.size.toLong, "distinct fact keys")
    assert(got.getLong(1) === pass.size.toLong, "bloom passes replay")
    assert(got.getLong(2) === truth.size.toLong, "exact matches replay")
    assert(got.getLong(3) === (pass.size - truth.size).toLong)
    assert(truth.subsetOf(pass), "bloom must have NO false negatives")
    assert(got.getLong(4) === factKeyRows.count(truth).toLong,
      "pruned-path join cardinality must equal the unpruned truth")
    // non-vacuity: the filter genuinely pruned, and something matched
    assert(truth.nonEmpty, "dim slice must be non-empty at this sf")
    assert(pass.size < fKeys.size,
      "bloom must reject most non-matching fact keys")
  }

  test("x21: KMV set-operation estimates replay driver-side — union " +
      "via merged bottom-K, intersection via the theta rule, integer " +
      "arithmetic end to end, estimates tracking truth") {
    import graft.functions.Portable
    import graft.operators.Extended.{X21_K, X21_H}
    def keys(year: Int): Set[String] = Tables.orders(spark, sf)
      .filter(expr(s"year(o_orderdate) = $year"))
      .select(col("o_custkey").cast("string"))
      .collect().map(_.getString(0)).toSet
    val (ha, hb) = (keys(1996).map(k => Portable.h60Jvm("x21|" + k)),
      keys(2000).map(k => Portable.h60Jvm("x21|" + k)))
    def bottomK(hs: Set[Long]): Seq[Long] = hs.toSeq.sorted.take(X21_K)
    val (ska, skb) = (bottomK(ha), bottomK(hb))
    val sku = bottomK((ska ++ skb).toSet)
    def est(sk: Seq[Long]): Long =
      if (sk.size < X21_K) sk.size.toLong
      else (BigInt(X21_K - 1) * X21_H / sk.max).toLong
    val theta = math.min(
      if (ska.size < X21_K) X21_H else ska.max,
      if (skb.size < X21_K) X21_H else skb.max)
    val c = ska.toSet.intersect(skb.toSet).count(_ < theta)
    val estI = (BigInt(c) * X21_H / theta).toLong
    val got = operators.Extended.x21SketchSetops.fn(spark, sf)
      .collect().head
    def g(n: String): Long = got.getLong(got.fieldIndex(n))
    assert(g("n_a_exact") === ha.size.toLong)
    assert(g("n_b_exact") === hb.size.toLong)
    assert(g("n_union_exact") === (ha ++ hb).size.toLong)
    assert(g("n_intersect_exact") === ha.intersect(hb).size.toLong)
    assert(g("n_a_est") === est(ska), "side-A estimate replays")
    assert(g("n_b_est") === est(skb))
    assert(g("n_union_est") === est(sku), "merged-bottom-K union replays")
    assert(g("n_intersect_est") === estI, "theta intersection replays")
    assert(g("n_a_only_est") === math.max(est(ska) - estI, 0L))
    // non-vacuity: the formula path is live (both sides >= K), the
    // overlap is genuinely partial, and the estimator lands within
    // ~4 sigma of truth at K=64 (1/sqrt(K-1) ~ 12.6% relative error)
    assert(ha.size >= X21_K && hb.size >= X21_K)
    assert(g("n_intersect_exact") > 0 && g("n_a_only_exact") > 0)
    assert(math.abs(g("n_union_est") - g("n_union_exact")).toDouble /
      g("n_union_exact") < 0.5)
  }

  test("x19 degenerate inputs: a depth with zero colliding buckets " +
      "contributes ip=0 to the min, never drops out — est stays 0, " +
      "not NULL, when no depth collides (ADVICE r18)") {
    import spark.implicits._
    import graft.functions.Portable
    import graft.operators.LlmOps.{CM_W, CM_D}
    // search two single-key sets whose buckets DISAGREE at every
    // depth (per candidate: (1-1/64)^4 ≈ 0.94, so the search is
    // instant) — then every depth has zero collisions and the old
    // inner-join min would have been min over ∅ = NULL
    def buckets(k: String): Seq[Long] =
      (0 until CM_D).map(i => Portable.h60Jvm(s"cm$i|$k") % CM_W)
    val k1 = "degenerate-a"
    val k2 = (1 to 1000).map(n => s"degenerate-b$n")
      .find(k => buckets(k).zip(buckets(k1)).forall(p => p._1 != p._2))
      .getOrElse(fail("no fully-disjoint key found in 1000 candidates"))
    val est = operators.Extended.cmJoinEstimate(spark,
      Seq(k1).toDF("k"), Seq(k2).toDF("k")).collect()
    assert(est.length === 1 && !est.head.isNullAt(0) &&
      est.head.getLong(0) === 0L,
      "no-collision estimate must be 0, not NULL")
    // and a PARTIAL degenerate: one shared key + one disjoint key per
    // side — some depths collide, some may not; est must still be ≥
    // exact (=1) and finite
    val est2 = operators.Extended.cmJoinEstimate(spark,
      Seq("shared", k1).toDF("k"), Seq("shared", k2).toDF("k"))
      .collect().head.getLong(0)
    assert(est2 >= 1L, "est must bound exact=1 from above")
  }
}
