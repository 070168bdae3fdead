package graft

import org.apache.spark.sql.functions._

/** a23 MMR quality gates (the r13 lesson: oracle-green can hide a
  * degenerate operator). Two independent checks:
  *   1. bit-exact greedy recompute of the full (pool -> 5 rounds)
  *      selection on the real sf0.001 embeddings — the operator's
  *      iterative DataFrame loop must equal a plain Scala loop;
  *   2. a planted clone pile-up where pure relevance top-5 is ALL
  *      near-duplicates — MMR must escape to the diverse candidate by
  *      pick 2, proving the diversity term actually changes the answer
  *      (not just reorders it).
  */
class MmrSpec extends SparkSuite {

  private def microCos(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < a.length) {
      dot += a(j).toDouble * b(j).toDouble
      na += a(j).toDouble * a(j).toDouble
      nb += b(j).toDouble * b(j).toDouble
      j += 1
    }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong
  }

  /** Plain-Scala greedy MMR over the same pool the operator builds:
    * per-probe top-12 by (sq desc, vec_id asc), then 5 rounds of
    * argmax 7*sq - 3*max_{s in S} pu with vec_id tie-break. */
  private def greedy(all: Seq[(Long, Array[Float])])
      : Set[(Long, Long, Long, Long)] = {
    val probes = all.filter(_._1 < 6)
    val out = Set.newBuilder[(Long, Long, Long, Long)]
    for ((pid, pv) <- probes) {
      val pool = all.filter(_._1 != pid)
        .map { case (id, v) => (id, microCos(v, pv)) }
        .sortBy { case (id, sq) => (-sq, id) }
        .take(12)
      val emb = all.toMap
      val pu = (for {
        (va, _) <- pool; (vb, _) <- pool if va != vb
      } yield (va, vb) -> microCos(emb(va), emb(vb))).toMap
      var sel = List.empty[Long]
      for (r <- 1 to 5) {
        val (vid, score) = pool
          .filterNot { case (id, _) => sel.contains(id) }
          .map { case (id, sq) =>
            val ms =
              if (sel.isEmpty) 0L else sel.map(s => pu((id, s))).max
            (id, 7L * sq - 3L * ms)
          }
          .minBy { case (id, sc) => (-sc, id) }
        out += ((pid, r.toLong, vid, score))
        sel ::= vid
      }
    }
    out.result()
  }

  test("a23 MMR: every pick equals an independent greedy recompute " +
    "on sf0.001") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
    val want = greedy(all)
    val got = operators.Ann.a23MmrRerank.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got.size === 30, s"6 probes x 5 picks expected, got ${got.size}")
    assert(got === want)
  }

  test("a23 MMR: planted clone pile-up — relevance top-5 is all " +
    "clones, MMR escapes to the diverse candidate by pick 2") {
    import spark.implicits._
    val dim = 64
    def axis(i: Int, w: Double, j: Int, wj: Double): Array[Float] = {
      val v = new Array[Float](dim)
      v(i) = w.toFloat; v(j) = wj.toFloat; v
    }
    val rnd = new scala.util.Random(7)
    // probe 0 = e1; 8 identical clones at cos 0.95; one diverse
    // candidate at cos 0.90 but orthogonal to the clones' off-axis
    // component: pick-2 scores are 7*950000 - 3*1000000 = 3,650,000
    // for a second clone vs 7*900000 - 3*855000 = 3,735,000 for the
    // diverse one — the diversity term MUST flip the order
    val probes = (0 until 6).map { i =>
      val v =
        if (i == 0) axis(0, 1.0, 1, 0.0)
        else {
          val a = Array.fill(dim)(rnd.nextGaussian())
          val n = math.sqrt(a.map(x => x * x).sum)
          a.map(x => (x / n).toFloat)
        }
      (i.toLong, v)
    }
    val clone = axis(0, 0.95, 1, math.sqrt(1 - 0.95 * 0.95))
    val clones = (0 until 8).map(i => ((100 + i).toLong, clone))
    val diverse =
      Seq((200L, axis(0, 0.90, 2, math.sqrt(1 - 0.90 * 0.90))))
    val noise = (0 until 40).map { i =>
      val a = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      ((300 + i).toLong, a.map(x => (x / n).toFloat))
    }
    val all = probes ++ clones ++ diverse ++ noise
    val fixDir = java.nio.file.Files.createTempDirectory("a23fix").toString
    all.toDF("vec_id", "embedding")
      .withColumn("label", (col("vec_id") % 3).cast("int"))
      .write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")

    // pure relevance top-5 for probe 0: clones only (0.95 > 0.90)
    val relTop5 = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, microCos(v, probes(0)._2)) }
      .sortBy { case (id, sq) => (-sq, id) }.take(5).map(_._1).toSet
    assert(relTop5.forall(id => id >= 100L && id < 200L),
      s"fixture broken: relevance top-5 $relTop5 should be all clones")

    val picks = operators.Ann.a23MmrRerank.fn(spark, fixDir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(picks.size === 5)
    assert(picks(1L) >= 100L && picks(1L) < 200L,
      s"pick 1 should be the most relevant (a clone), got ${picks(1L)}")
    assert(picks(2L) === 200L,
      s"pick 2 must escape the clone pile to the diverse candidate, " +
        s"got ${picks(2L)}")
    assert(picks.values.toSet != relTop5,
      "MMR output must differ from pure relevance top-5")
  }

  test("E8: the serving composition is consistent stage-by-stage — " +
      "picks come from a26's pool with matching ranks, pick 1 is the " +
      "fused argmax, packing replays exactly, and diversity shows") {
    import org.apache.spark.sql.functions._
    // sf0.01: the 500-doc slice's fused top-3 happens to already be
    // diverse for every probe, which would make the diversification
    // assert vacuous; the 1000-doc corpus genuinely forces an MMR
    // escape (probe 0 swaps fused rank 3 for rank 4)
    val sf = "/root/testdata/sf0.01"
    val hybrid = operators.Ann.a26HybridRrf.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(r.fieldIndex("fused_rk"))).toMap
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = operators.Ann.e8RagPipeline.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .toMap
    val byProbe = rows.groupBy(_._1._1)
    byProbe.foreach { case (p, cells) =>
      assert(cells.size === 3, s"probe $p must emit exactly 3 picks")
      val picks = (1L to 3L).map(k => cells((p, k)))
      assert(picks.map(_._1).distinct.size === 3,
        s"probe $p picked a document twice")
      picks.foreach { case (doc, rk, nt, _, _) =>
        assert(hybrid((p, doc)) === rk,
          s"probe $p doc $doc: rank disagrees with a26's fused table")
        assert(toks(doc) === nt, s"probe $p doc $doc token count")
      }
      assert(picks.head._2 === 1L,
        s"probe $p: pick 1 must be the fused argmax (rank 1)")
      // packing replay: greedy skip over pick order, budget 64
      var cum = 0L
      picks.foreach { case (doc, _, nt, inc, gotCum) =>
        val expInc = cum + nt <= 64L
        if (expInc) cum += nt
        assert(inc === expInc, s"probe $p doc $doc include flag")
        assert(gotCum === cum, s"probe $p doc $doc cum_tokens")
      }
    }
    // MMR must visibly diversify somewhere: some probe's pick set is
    // NOT the fused top-3
    assert(byProbe.exists { case (p, cells) =>
      (1L to 3L).map(k => cells((p, k))._2).toSet != Set(1L, 2L, 3L)
    }, "every probe's picks equal fused top-3 — diversification vacuous")
    // and the packing must exercise BOTH verdicts somewhere
    assert(rows.values.exists(_._4) && rows.values.exists(!_._4),
      "fixture must produce included AND skipped picks")
  }
}
