package graft

import org.apache.spark.sql.functions._

/** The custom codegen'd cosine_sim expression: correctness against the
  * higher-order-function formulation, null/edge behavior, and SQL
  * availability through GraftExtensions. */
class CosineSimSpec extends SparkSuite {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / " +
      "(sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) * " +
      " sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"

  test("cosine_sim equals the HOF formulation bit-for-bit on testdata") {
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").as("a"))
      .limit(100)
      .crossJoin(Tables.embeddings(spark, sf)
        .select(col("embedding").as("b")).limit(3))
    val diff = e.select(
      expr("cosine_sim(a, b)").as("fused"), expr(hof).as("ref"))
      .filter(col("fused") =!= col("ref"))
    assert(diff.count() === 0, "fused loop must match left-fold HOF exactly")
  }

  test("cosine_sim basics: identity 1.0, orthogonal 0.0, null in -> null out") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b")
    val vals = df.select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    assert(vals(0) === 1.0)
    assert(vals(1) === 0.0)
    val nulls = df.select(expr("cosine_sim(a, CAST(NULL AS ARRAY<FLOAT>))"))
    assert(nulls.collect().forall(_.isNullAt(0)))
  }

  test("cosine_sim: zero-norm and length-mismatch yield NULL, not NaN") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)), // zero-norm left
      (Seq(1.0f, 2.0f), Seq(0.0f, 0.0f)), // zero-norm right
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)) // length mismatch
    ).toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)")).collect()
    assert(out.forall(_.isNullAt(0)),
      "NaN would sort above every real similarity under DESC top-k")
  }

  test("cosine_sim interpreted eval matches codegen (incl. null cases)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.CosineSimilarity
    def lit(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType))
    def ev(a: Seq[Float], b: Seq[Float]): Any =
      CosineSimilarity(lit(a), lit(b)).eval(null)
    assert(ev(Seq(1f, 0f), Seq(1f, 0f)) === 1.0)
    assert(ev(Seq(1f, 0f), Seq(0f, 1f)) === 0.0)
    assert(ev(Seq(0f, 0f), Seq(1f, 2f)) === null) // zero norm
    assert(ev(Seq(1f, 2f, 3f), Seq(1f, 2f)) === null) // length mismatch
    // null ELEMENT propagates to NULL, matching the zip_with fallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.CosineSimilarity
    val withNull = Literal.create(Seq[java.lang.Float](1.0f, null),
      ArrayType(FloatType, containsNull = true))
    assert(CosineSimilarity(withNull,
      Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType))).eval(null)
      === null)
  }

  test("cosine_sim accepts float/double arrays per side, bit-equal to " +
    "the upcast HOF form") {
    // double×double and the MIXED case (float corpus × double centroid,
    // a8's iteration-2 shape) — each must equal the all-double HOF fold
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.0f), Seq(0.5, 4.0, -1.125)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3, 0.2, 0.1))
    ).toDF("f", "d")
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val ref = s"${dot("f", "d")} / (sqrt(${dot("f", "f")}) * sqrt(${dot("d", "d")}))"
    val out = df.select(
      expr("cosine_sim(f, d)").as("mixed"),
      expr("cosine_sim(CAST(f AS ARRAY<DOUBLE>), d)").as("dd"),
      expr(ref).as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(2), "mixed must match HOF")
      assert(r.getDouble(1) === r.getDouble(2), "double×double must match")
    }
  }

  test("cosine_sim rejects non-numeric-array inputs at analysis time") {
    val bad = Seq((Seq("x", "y"), Seq(1.0, 2.0))).toDF("a", "b")
    val err = intercept[Exception] {
      bad.select(expr("cosine_sim(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("A11: recall report covers both indexes with bounded, exact ratios") {
    val rows = graft.operators.Ann.a11AnnRecall.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    // one row per probe per index, nobody dropped by the hit join
    assert(rows.count(_._1 == "lsh") === 40)
    assert(rows.count(_._1 == "ivf") === 10)
    rows.foreach { case (idx, probe, k, hits, recall) =>
      assert(k === (if (idx == "lsh") 3 else 5))
      assert(hits >= 0L && hits <= k.toLong, s"$idx probe $probe hits $hits")
      assert(recall ===
        BigDecimal(hits.toDouble / k)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // an index that found NOTHING for every probe would make the report
    // vacuous — the buckets/cells must deliver some true neighbors
    assert(rows.filter(_._1 == "lsh").map(_._4).sum > 0L)
    assert(rows.filter(_._1 == "ivf").map(_._4).sum > 0L)
  }

  test("A12: product quantization is exact on the codebook's own vectors") {
    val rows = graft.operators.Ann.a12ProductQuant.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (code, nDims, rmse)) =>
      assert(nDims === 64L, s"vec $id reconstructed $nDims dims")
      assert(code >= 0L && code < (1L << 16), s"vec $id code $code")
      assert(rmse >= 0.0)
    }
    // a centroid-source vector is its own nearest centroid in EVERY
    // subspace: code_m = vec_id for all 8 subspaces, rmse exactly 0
    val allSubs = (0 until 8).map(sub => 1L << (2 * sub)).sum
    (0 until 4).foreach { v =>
      val (code, _, rmse) = rows(v.toLong)
      assert(code === v * allSubs, s"seed $v packed code")
      assert(rmse === 0.0, s"seed $v must reconstruct exactly")
    }
    // quantization is lossy on the rest of the corpus — if every vector
    // had rmse 0 the operator would be vacuous
    assert(rows.values.count(_._3 > 0.0) > rows.size / 2)
  }

  test("A13: ADC ranking matches a driver-side table-lookup recompute") {
    val out = graft.operators.Ann.a13PqAdc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet === (100L until 110L).toSet)
    byProbe.values.foreach { rs =>
      assert(rs.length === 5)
      assert(rs.map(_._3).toSeq === rs.map(_._3).sorted.toSeq,
        "per-probe ADC distances must be ascending")
      rs.foreach { case (_, _, dist) => assert(dist >= 0.0) }
    }
    // independent ground truth: rebuild the ADC sum for ONE probe from
    // the embeddings table in plain Scala (same 6-decimal discipline)
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => BigDecimal(f.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray)
      .toMap
    def sqdMicro(v: Array[Double], c: Array[Double], sub: Int): Long = {
      val terms = (sub * 8 until sub * 8 + 8).map { i =>
        BigDecimal((v(i) - c(i)) * (v(i) - c(i)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      (terms.sum * 1000000).toLongExact
    }
    val codeOf = embs.map { case (id, v) =>
      id -> (0 until 8).map(sub =>
        (0 until 4).minBy(cid => (sqdMicro(v, embs(cid.toLong), sub), cid)))
    }
    val probe = embs(100L)
    val expected = embs.keys.filter(_ != 100L).map { id =>
      id -> codeOf(id).zipWithIndex
        .map { case (cid, sub) => sqdMicro(probe, embs(cid.toLong), sub) }
        .sum
    }.toSeq.sortBy { case (id, m) => (m, id) }.take(5)
    val got = byProbe(100L).sortBy(r => (r._3, r._2))
      .map(r => (r._2, math.round(r._3 * 1e6)))
    assert(got.toSeq === expected.map { case (id, m) => (id, m) },
      "probe 100's top-5 must match the scalar recompute exactly")
  }

  test("A14: IVF-PQ candidates stay in the probe's cell and agree with a13") {
    val cellOf = graft.operators.Ann.a8KmeansRefine.fn(spark, sf)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = graft.operators.Ann.a14IvfPq.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byProbe = out.groupBy(_._1)
    // every probe's trained cell is corpus-sized at this sf, so all 10
    // probes must fill their top-5
    assert(byProbe.keySet === (100L until 110L).toSet)
    byProbe.values.foreach(rs => assert(rs.length === 5))
    // cell routing: a candidate outside the probe's cell means the join
    // keys leaked — the entire IVF pruning claim
    out.foreach { case (probe, vec, _) =>
      assert(cellOf(vec) === cellOf(probe),
        s"candidate $vec not in probe $probe's cell")
    }
    // ADC is the same table-lookup sum as a13: any (probe, vec) pair
    // surfaced by both searches must carry the identical distance
    val a13Dist = graft.operators.Ann.a13PqAdc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = out.filter { case (p, v, _) => a13Dist.contains((p, v)) }
    assert(shared.nonEmpty,
      "same-cell top-5s never intersecting the global top-5s is implausible")
    shared.foreach { case (p, v, dist) =>
      assert(dist === a13Dist((p, v)), s"ADC mismatch for ($p, $v)")
    }
  }

  test("A20: filtered search respects the predicate; the post-filter " +
      "shortfall is exact, never padded") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Ann.a20FilteredAnn.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = graft.operators.Ann.a8KmeansRefine.fn(spark, sf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet === (0L until 8L).toSet)
    for ((p, rows) <- byProbe) {
      // every hit carries the probe's label — the predicate is hard
      rows.foreach { case (_, _, v, _, _) =>
        assert(labels(v) === labels(p), s"probe $p hit $v wrong label") }
      val pre = rows.filter(_._2 == "prefilter")
      val post = rows.filter(_._2 == "ivf_postfilter")
      // prefilter is exact over the label slice: always k rows (the
      // fixture labels are far larger than k), dense ranks
      assert(pre.length === 5, s"probe $p prefilter ${pre.length}")
      assert(pre.map(_._5).sorted.toSeq === (1L to 5L))
      // post-filter returns exactly min(k, |cell ∩ label| - self) —
      // the shortfall is structural, not a bug, and must not be padded
      val cellLabel = labels.keySet.count(v => v != p &&
        cells(v) == cells(p) && labels(v) == labels(p))
      assert(post.length === math.min(5, cellLabel),
        s"probe $p postfilter ${post.length} vs cell∩label $cellLabel")
      // cell-restricted candidates can never beat the exact slice scan
      if (post.nonEmpty)
        assert(post.map(_._4).max <= pre.map(_._4).max + 1e-9,
          s"probe $p post best exceeds pre best")
      post.foreach { case (_, _, v, _, _) =>
        assert(cells(v) === cells(p), s"probe $p post hit $v off-cell") }
    }
  }

  test("A21: recall and candidate cost are monotone in nprobe") {
    val rows = graft.operators.Ann.a21NprobeSweep.fn(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byProbe = rows.groupBy(_._2)
    assert(byProbe.nonEmpty)
    for ((p, tiers) <- byProbe) {
      val sorted = tiers.sortBy(_._1)
      // widening the routed cell set can only ADD candidates and
      // therefore never lose a true neighbor already found
      assert(sorted.map(_._3).toSeq ===
        sorted.map(_._3).sorted.toSeq,
        s"probe $p candidates not monotone")
      assert(sorted.map(_._5).toSeq ===
        sorted.map(_._5).sorted.toSeq, s"probe $p recall not monotone")
      tiers.foreach { case (np, _, nc, nh, rec) =>
        assert(nh >= 0L && nh <= 5L)
        assert(rec === nh.toDouble / 5, s"probe $p tier $np recall")
        assert(nc >= nh, s"probe $p tier $np fewer candidates than hits")
      }
    }
    // the curve must not be flat-zero (a broken router would still be
    // monotone) — across the probe set, the widest tier finds truth
    assert(rows.filter(_._1 == graft.operators.Ann.NPROBES.max)
      .map(_._4).sum > 0L, "widest tier found no true neighbors")
  }
}
