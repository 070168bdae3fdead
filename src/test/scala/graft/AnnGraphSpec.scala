package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A17 graph-ANN: structural invariants of the NSW edge list and beam,
  * and recall of the greedy search against exact brute-force truth.
  * (The CORRECTNESS row judges a17 against its own declared algorithm,
  * a6-style; recall against the exact answer is quality, so it lives
  * here — the a11/d4b self-evaluation pattern.) */
class AnnGraphSpec extends SparkSuite {

  private def bruteTop(k: Int) = {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("emb"))
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
    val dot = "aggregate(zip_with(emb, p_emb, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
      "(a, v) -> a + v)"
    val n = (c: String) => s"sqrt(aggregate(zip_with($c, $c, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
      "(a, v) -> a + v))"
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(expr(s"$dot / nullif(${n("emb")} * ${n("p_emb")}, 0.0)"), 6)
          .as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("probe_id", "vec_id")
  }

  test("A17: edge list respects per-family out-degree bounds") {
    val deg = operators.Ann.nswEdges(spark, sf)
      .groupBy("v").count().agg(max("count")).head().getLong(0)
    assert(deg <= 12, s"out-degree $deg exceeds NSW_M + NSW_M2") // 8 + 4
  }

  test("A17: beam output is k-per-probe with ranks ordered by similarity") {
    val out = operators.Ann.a17NswSearch.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet === (0L until 8L).toSet)
    for ((p, rows) <- byProbe) {
      assert(rows.length === 5, s"probe $p beam size")
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to 5L),
        s"probe $p ranks not dense")
      assert(byRank.map(_._3).toSeq ==
        byRank.map(_._3).sortBy(-(_: Double)).toSeq,
        s"probe $p sims not ordered")
    }
  }

  test("A17: greedy beam recall@5 vs exact brute force clears the floor") {
    val truth = bruteTop(5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val found = operators.Ann.a17NswSearch.fn(spark, sf)
      .filter(col("vec_id") =!= col("probe_id")) // self-hit isn't recall
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (p, t) =>
      (found.getOrElse(p, Set.empty) intersect t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    // 4 hops from one entry point over an M=6/M2=3 graph: a greedy beam
    // must beat blind bucket search decisively; exact recall varies
    // with the (regenerated-per-round) embedding fixture, so the bound
    // is a floor, not a pin
    assert(mean >= 0.5, s"mean recall@5 $mean below floor (per-probe: " +
      recalls.mkString(", ") + ")")
  }
}
