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
}
