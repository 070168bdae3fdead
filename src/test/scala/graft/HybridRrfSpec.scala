package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** a26 hybrid-retrieval quality gates. The DuckDB oracle proves
  * cross-engine parity; these tests prove the FUSION is semantically
  * load-bearing, not a reordering of one arm:
  *   1. a planted corpus where the probe's best match by EMBEDDING
  *      shares no vocabulary with it, and the best match by VOCABULARY
  *      is embedded orthogonally — fusion must surface BOTH in the
  *      top ranks, each null on the arm that cannot see it;
  *   2. internal consistency on the real sf0.001 tables: the reported
  *      rrf must recompute exactly from the reported per-arm ranks,
  *      and fused_rk must be the (rrf desc, doc_id asc) ordering;
  *   3. non-vacuity at sf0.001: the fused output must contain
  *      both-arm rows AND at least one single-arm row (otherwise the
  *      outer join never fires and the operator degenerates to rank
  *      intersection).
  */
class HybridRrfSpec extends SparkSuite {

  private val dim = 8

  /** unit basis-ish vectors: e(i) has 1.0 at axis i. */
  private def axis(i: Int): Array[Float] = {
    val a = Array.fill(dim)(0.0f); a(i) = 1.0f; a
  }
  /** close to axis(i) but not identical (cos ≈ 0.9999). */
  private def nearAxis(i: Int): Array[Float] = {
    val a = Array.fill(dim)(0.02f); a(i) = 1.0f; a
  }

  private def frames(rows: Seq[(Long, Array[Float], String)]) = {
    val s = spark
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("emb", ArrayType(FloatType))))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val e = s.createDataFrame(
      s.sparkContext.parallelize(
        rows.map { case (id, v, _) => Row(id, v.toSeq) }),
      embSchema)
    val docs = s.createDataFrame(
      s.sparkContext.parallelize(
        rows.map { case (id, _, t) => Row(id, t) }),
      docSchema)
    (e, docs)
  }

  test("planted dense-only and sparse-only hits both reach the fused top") {
    // probe 0 talks about "quantum entanglement photons"; its embedding
    // is axis 0. doc 50 = SPARSE hit (same rare vocabulary, orthogonal
    // embedding axis 5). doc 60 = DENSE hit (near-identical embedding,
    // disjoint vocabulary). docs 70.. = filler on other axes with
    // unrelated text so neither arm is trivially size-1. RRF_PROBES = 6,
    // so ids 1-5 are probes too — give them bland filler far from the
    // planted axes.
    val filler = (0 until 12).map { j =>
      (70L + j, nearAxis(2 + (j % 3)),
        s"common words about weather and cooking recipe number $j")
    }
    val rows = Seq(
      (0L, axis(0), "quantum entanglement photons experiment"),
      (1L, axis(1), "bland probe text one"),
      (2L, axis(1), "bland probe text two"),
      (3L, axis(1), "bland probe text three"),
      (4L, axis(1), "bland probe text four"),
      (5L, axis(1), "bland probe text five"),
      (50L, axis(5), "quantum entanglement photons laboratory"),
      (60L, nearAxis(0), "completely different wording here entirely")
    ) ++ filler
    val (e, docs) = frames(rows)
    val out = operators.Ann.hybridRrfOver(spark, e, docs)
      .filter(col("probe_id") === 0L)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        Option(r.get(r.fieldIndex("dense_rk"))).map(_.toString.toLong),
        Option(r.get(r.fieldIndex("sparse_rk"))).map(_.toString.toLong),
        r.getLong(r.fieldIndex("fused_rk"))))
      .toSeq
    val byDoc = out.map(t => t._1 -> t).toMap
    // the dense hit is in the fused top and the sparse arm never saw it
    // (its words share nothing >= RRF_MINLEN chars with the probe)
    val denseHit = byDoc(60L)
    assert(denseHit._2.contains(1L),
      s"doc 60 should be the #1 dense neighbor, got $denseHit")
    assert(denseHit._3.isEmpty,
      s"doc 60 must be invisible to the sparse arm, got $denseHit")
    // the sparse hit is in the fused top and the dense arm ranked it
    // far below the near-axis filler (orthogonal axis): it may appear
    // in the depth-20 dense list, but its sparse rank must be #1
    val sparseHit = byDoc(50L)
    assert(sparseHit._3.contains(1L),
      s"doc 50 should be the #1 sparse match, got $sparseHit")
    assert(sparseHit._2.forall(_ > 1L),
      s"doc 50 must not lead the dense arm, got $sparseHit")
    // and both beat the filler in the fused ranking
    assert(denseHit._4 <= 3 && sparseHit._4 <= 3,
      s"fusion must surface both planted hits near the top: $out")
  }

  test("rrf recomputes from the reported per-arm ranks (sf0.001)") {
    val rows = SparkEntry.queries("a26_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dk = Option(r.get(r.fieldIndex("dense_rk")))
        .map(_.toString.toLong)
      val sk = Option(r.get(r.fieldIndex("sparse_rk")))
        .map(_.toString.toLong)
      val expect = BigDecimal(
        dk.map(k => 1.0 / (operators.Ann.RRF_C + k)).getOrElse(0.0) +
          sk.map(k => 1.0 / (operators.Ann.RRF_C + k)).getOrElse(0.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = r.getDouble(r.fieldIndex("rrf"))
      assert(math.abs(got - expect) < 1e-12,
        s"rrf mismatch: got $got expected $expect for ranks ($dk,$sk)")
      assert(dk.nonEmpty || sk.nonEmpty,
        "a fused row must come from at least one arm")
    }
    // fused_rk is the (rrf desc, doc_id asc) order within each probe
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (-r.getDouble(r.fieldIndex("rrf")),
          r.getLong(r.fieldIndex("doc_id"))))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(r.fieldIndex("fused_rk")) == i + 1L,
          "fused_rk must follow (rrf desc, doc_id asc)")
      }
    }
  }

  test("fusion is non-vacuous at sf0.001: single-arm and both-arm rows") {
    val rows = SparkEntry.queries("a26_hybrid_rrf")(spark, sf).collect()
    val arms = rows.map { r =>
      (Option(r.get(r.fieldIndex("dense_rk"))).nonEmpty,
        Option(r.get(r.fieldIndex("sparse_rk"))).nonEmpty)
    }
    assert(arms.exists { case (d, s) => d && s },
      "expected at least one doc found by both arms")
    assert(arms.exists { case (d, s) => d ^ s },
      "expected at least one single-arm doc — fusion never fired")
  }
}
