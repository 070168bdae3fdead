package graft

import org.apache.spark.sql.functions._

/** The claim d4b's commentary makes: the banded sign-LSH index is
  * ~3%-selective per table in the 0.3–0.6 cosine band (so low recall
  * there is the configured trade), but recalls ≳90% of GENUINE
  * near-dups. This spec plants real near-duplicates — 1%-noise copies
  * at cosine ≈ 0.9999 — in a random corpus and measures both claims.
  */
class BandedLshRecallSpec extends SparkSuite {
  import spark.implicits._

  test("banded LSH recalls planted near-duplicates (sim ≈ 1) at ≳90%") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic spec
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 200).map { i =>
      i.toLong -> unit(Array.fill(64)(rnd.nextGaussian()))
    }
    // 50 planted near-dups: ids 1000+i copy vector i with 1% noise
    val dups = base.take(50).map { case (id, v) =>
      (id + 1000L) -> unit(v.map(_ + 0.01 * rnd.nextGaussian()))
    }
    val e = (base ++ dups).toDF("vec_id", "emb")
    val found = operators.Ann.bandedNearDups(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 50).map(i => (i.toLong, i + 1000L)).toSet
    val recalled = planted.count(found.contains)
    assert(recalled >= 45,
      s"only $recalled/50 planted near-dups recalled; " +
        "4 tables x 8 sign bits should catch >= 90% at sim ~ 1")
    // and every reported pair really is above the exact threshold —
    // candidates are verified, never trusted from the buckets alone
    val sims = operators.Ann.bandedNearDups(spark, e).collect()
    sims.foreach(r => assert(r.getDouble(2) >= 0.3))
  }

  test("blocker recall at mid similarity matches the analytic trade (r11 advice)") {
    // d12's election sees ONLY the blocker's candidates, and the blocker
    // is sized for near-duplicates: per-bit collision probability for a
    // pair at cosine c is p = 1 - acos(c)/π, so an 8-bit band collides
    // at p^8 and 4 tables give 1-(1-p^8)^4 — at c = 0.5 that is ~0.147.
    // This probe PLANTS pairs at exact cosine 0.5 and pins the measured
    // recall to that analytic value, so the documented restriction
    // ("the election is over near-duplicate candidates, not all pairs
    // ≥ τ") is a quantified engineering trade, not a silent gap.
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val c = 0.5
    val pairs = (0 until 300).map { i =>
      val a = unit(Array.fill(64)(rnd.nextGaussian()))
      val w0 = Array.fill(64)(rnd.nextGaussian())
      // Gram-Schmidt: w ⟂ a, then b = c·a + sqrt(1-c²)·w has ⟨a,b⟩ = c
      val proj = a.zip(w0).map { case (x, y) => x * y }.sum
      val w = unit(w0.zip(a).map { case (y, x) => y - proj * x })
      val b = a.zip(w).map { case (x, y) =>
        c * x + math.sqrt(1 - c * c) * y }
      (i.toLong, a.map(_.toFloat), (i + 10000L), b.map(_.toFloat))
    }
    val e = pairs.flatMap { case (ia, va, ib, vb) =>
      Seq((ia, va), (ib, vb)) }.toDF("vec_id", "emb")
    val found = operators.Ann.bandedNearDups(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = pairs.count { case (ia, _, ib, _) =>
      found.contains((ia, ib)) }
    val recall = recalled / 300.0
    // analytic 0.147; 300 trials → sd ≈ 0.02. The BOUNDS are the spec:
    // a blocker resized for τ would have to move the upper bound up.
    assert(recall >= 0.05 && recall <= 0.30,
      f"mid-sim recall $recall%.3f departs from the documented " +
        "~0.15 analytic trade of the 8-bit x 4-table blocker")
  }

  test("tau-sized band set (4-bit x 8-table) hits the analytic recall curve at cosine 0.4-0.6") {
    // d12b's blocker exists to reach τ = 0.4: with b = 4 bits and L = 8
    // tables, 1-(1-p^b)^L reads ≈ 0.79 / 0.83 / 0.90 at cosine
    // 0.45 / 0.5 / 0.6 — the mid-band recall d12's 8-bit × 4-table
    // blocker gives up (~0.15 at 0.5, the test above). Plant 300 exact-
    // cosine pairs per c and pin the measured recall to the analytic
    // figure (±0.10 ≈ 4 binomial sd at n = 300). c = 0.45 not 0.40 at
    // the low end: the blocker emits pairs at sim ≥ τ, and a pair
    // planted AT the threshold rounds to either side of it in float32.
    val rnd = new scala.util.Random(13)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    for (c <- Seq(0.45, 0.5, 0.6)) {
      val pairs = (0 until 300).map { i =>
        val a = unit(Array.fill(64)(rnd.nextGaussian()))
        val w0 = Array.fill(64)(rnd.nextGaussian())
        val proj = a.zip(w0).map { case (x, y) => x * y }.sum
        val w = unit(w0.zip(a).map { case (y, x) => y - proj * x })
        val b = a.zip(w).map { case (x, y) =>
          c * x + math.sqrt(1 - c * c) * y }
        (i.toLong, a.map(_.toFloat), (i + 10000L), b.map(_.toFloat))
      }
      val e = pairs.flatMap { case (ia, va, ib, vb) =>
        Seq((ia, va), (ib, vb)) }.toDF("vec_id", "emb")
      val found = operators.Ann.bandedNearDupsTau(spark, e)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = pairs.count { case (ia, _, ib, _) =>
        found.contains((ia, ib)) } / 300.0
      val p = 1 - math.acos(c) / math.Pi
      val analytic = 1 - math.pow(1 - math.pow(p, 4), 8)
      assert(math.abs(recall - analytic) <= 0.10,
        f"c=$c%.2f: measured recall $recall%.3f vs analytic " +
          f"$analytic%.3f for the 4-bit x 8-table band set")
    }
  }

  test("a22 range search: exact side equals brute force; sample cap " +
    "caps a planted pile-up and reports it as missed") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(99)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // probe 0's direction shared by 300 clones (cosine 1 > tau): the
    // exact side must count all 300; every clone co-buckets with the
    // probe in EVERY table, so the banded pool is the deterministic
    // 64-sample and the shortfall lands in `missed` (the a17
    // degenerate-pile-up shape, now bounded AND visible)
    val dir = Array.fill(64)(rnd.nextGaussian())
    val probes = (0 until 8).map { i =>
      val v = if (i == 0) dir else Array.fill(64)(rnd.nextGaussian())
      (i.toLong, unit(v))
    }
    val clones = (0 until 300).map(i => ((100 + i).toLong, unit(dir)))
    val noise = (0 until 100).map(i =>
      ((1000 + i).toLong, unit(Array.fill(64)(rnd.nextGaussian()))))
    val all = probes ++ clones ++ noise
    val fixDir = java.nio.file.Files.createTempDirectory("a22fix").toString
    all.toDF("vec_id", "embedding")
      .withColumn("label", (col("vec_id") % 3).cast("int"))
      .write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")
    val rows = operators.Ann.a22RangeSearch.fn(spark, fixDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent brute force for n_exact (same rounding)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (j <- 0 until 64) {
        dot += a(j).toDouble * b(j).toDouble
        na += a(j).toDouble * a(j).toDouble
        nb += b(j).toDouble * b(j).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = all.toMap
    for ((pid, pv) <- probes) {
      val want = all.count { case (id, v) =>
        id != pid && cos(v, pv) >= operators.Ann.RANGE_TAU }
      assert(rows(pid)._1 === want.toLong,
        s"probe $pid n_exact ${rows(pid)._1} != brute force $want")
      val (ne, nb, missed) = rows(pid)
      assert(missed === ne - nb, s"probe $pid missed arithmetic")
      assert(nb <= ne, s"probe $pid banded found more than exact")
    }
    // the pile-up probe: exact sees all 300 clones, the banded pool is
    // capped at A22_CAP so the sample cap must have bitten — and the
    // report says so instead of silently returning a full-looking set
    val (ne0, nb0, missed0) = rows(0L)
    assert(ne0 >= 300L, s"probe 0 exact side $ne0 missed the clones")
    assert(nb0 <= operators.Ann.A22_CAP,
      s"probe 0 banded pool $nb0 exceeded the per-bucket sample cap")
    assert(missed0 > 0L, "the capped shortfall must be visible")
    assert(byId.contains(0L)) // fixture sanity
  }
}
