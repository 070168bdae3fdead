package graft

/** A28 binary quantization + A29 matryoshka truncation, each checked
  * against an INDEPENDENT plain-Scala replay of its declared algorithm
  * (the DedupSpec discipline: the engine's relational form and a
  * sequential reimplementation must agree row-for-row — the DuckDB
  * oracle then triangulates the same math on a third engine). */
class QuantSpec extends SparkSuite {

  /** Spark's round(x, 6) for doubles: HALF_UP on the shortest decimal
    * representation (BigDecimal.valueOf). */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine's cosine kernel: dot and both norms accumulated in
    * DOUBLE, left to right, in one pass. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val corpus: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(_.toDouble)).toMap

  test("A28: signatures, Hamming prefilter, rerank and exact_hit all " +
      "match a sequential replay of the declared algorithm") {
    val n = corpus.size
    // per-dim mean: 6dp-rounded values summed as exact decimals, cast
    // to double, divided, rounded — the engine's accumulation order
    val mu = (0 until 64).map { j =>
      val s = corpus.values.map(v => BigDecimal(r6(v(j)))).sum
      r6(s.toDouble / n)
    }
    val sigs = corpus.map { case (id, v) =>
      var lo = 0L; var hi = 0L
      for (j <- 0 until 64; if v(j) > mu(j))
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      id -> ((lo, hi))
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Long =
      (java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)).toLong
    val probes = corpus.keys.filter(_ < 20).toSeq.sorted
    val want = probes.flatMap { p =>
      val cand = corpus.keys.filter(_ != p).toSeq
        .map(v => (v, hamming(sigs(p), sigs(v))))
        .sortBy { case (v, h) => (h, v) }.take(20)
        .map { case (v, h) => (v, h, r6(cos(corpus(v), corpus(p)))) }
      val top = cand.sortBy { case (v, _, s) => (-s, v) }.take(5)
      val truth = corpus.keys.filter(_ != p).toSeq
        .map(v => (v, r6(cos(corpus(v), corpus(p)))))
        .sortBy { case (v, s) => (-s, v) }.take(5).map(_._1).toSet
      top.map { case (v, h, s) =>
        (p, v) -> ((h, s, if (truth(v)) 1L else 0L))
      }
    }.toMap
    val got = operators.Ann.a28BinaryQuant.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.size === probes.size * 5, "5 reranked rows per probe")
    assert(got === want)
    // non-vacuity: the prefilter must genuinely help — at least one
    // probe's BQ top-5 hits the exact top-5 (random 64-bit signatures
    // preserve enough cosine geometry for that on any real corpus)
    assert(got.values.exists(_._3 === 1L),
      "binary signatures found none of the exact neighbors — the " +
        "packing or the Hamming ordering is broken")
  }

  test("A29: prefix-cosine top-k and per-width recall match a " +
      "sequential replay; full-width recall would be 1 by identity") {
    val probes = corpus.keys.filter(_ < 20).toSeq.sorted
    def topk(m: Int, p: Long): Set[Long] =
      corpus.keys.filter(_ != p).toSeq
        .map(v => (v, r6(cos(corpus(v).take(m), corpus(p).take(m)))))
        .sortBy { case (v, s) => (-s, v) }.take(5).map(_._1).toSet
    val want = (for {
      m <- Seq(16, 32); p <- probes
    } yield (m.toLong, p) -> topk(64, p).count(topk(m, p)).toLong).toMap
    val got = operators.Ann.a29MatryoshkaRecall.fn(spark, sf).collect()
      .map { r =>
        // recall must be the exact integer ratio of its own row
        assert(r.getDouble(4) === r6(r.getLong(3).toDouble / 5))
        assert(r.getLong(2) === 5L)
        (r.getLong(0), r.getLong(1)) -> r.getLong(3)
      }.toMap
    assert(got === want)
    // the width decision needs a real signal: truncation must lose
    // SOMETHING somewhere (else the report says "serve 16 dims" for
    // free), and more dims must recover more of the truth IN AGGREGATE
    // (pointwise monotonicity isn't guaranteed; the corpus-wide hit
    // total is the number the serving decision actually reads)
    assert(want.values.exists(_ < 5L), "no truncation loss at all")
    def total(m: Long) =
      want.collect { case ((`m`, _), h) => h }.sum
    assert(total(32L) > total(16L),
      "wider prefixes must recover strictly more of the exact top-5 " +
        s"in aggregate (32d ${total(32L)} vs 16d ${total(16L)})")
  }

  test("A30: the in-cell BQ search is consistent with a7b's in-cell " +
      "float search — exact_hit rows are exactly the a7b overlap") {
    val a7b = operators.Ann.a7bIvfTrained.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = operators.Ann.a30IvfBq.fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)),
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(5))))
    assert(rows.nonEmpty)
    val probes = rows.map(_._1._1).distinct
    assert(probes.sorted === (100L until 110L),
      "a30 must search a7b's exact probe set")
    rows.foreach { case ((p, v), (_, ham, sim, hit)) =>
      assert(ham >= 0 && ham <= 64, s"($p,$v) hamming out of range")
      assert(sim <= 1.000001, s"($p,$v) cosine above 1")
      // a7b IS the cell-exhaustive float top-5 for these probes, so
      // exact_hit must mark precisely the a7b overlap
      assert((hit == 1L) === a7b((p, v)),
        s"($p,$v): exact_hit disagrees with a7b's in-cell truth")
    }
    assert(rows.count(_._2._4 == 1L) > 0,
      "the signatures found none of the in-cell float top-5 — packing " +
        "or cell routing is broken")
    // every probe emits exactly BQ_K reranked rows (cells here are
    // corpus-quarter sized, far above the candidate count)
    rows.groupBy(_._1._1).foreach { case (p, rs) =>
      assert(rs.size === 5, s"probe $p emitted ${rs.size} rows")
    }
  }
}
