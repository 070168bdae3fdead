package graft

import org.apache.spark.sql.functions._

/** c10 quality gates: equal-mass stages (within the provable one-
  * length-value bound), strict difficulty monotonicity across stages,
  * and real interleaving — the seeded-hash order must MIX sources, not
  * concatenate them (the failure mode curriculum ordering exists to
  * prevent). */
class CurriculumSpec extends SparkSuite {

  test("c10: stages are difficulty-monotone and equal-mass within one " +
    "length-value's mass on sf0.001") {
    val rows = operators.LlmOps.c10Curriculum.fn(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3))) // (n_tok, stage)
    val k = operators.LlmOps.C10_STAGES
    val byStage = rows.groupBy(_._2)
    assert(byStage.keySet === (0L until k).toSet,
      s"every stage must be populated, got ${byStage.keySet}")
    // monotone: stage boundaries never interleave difficulties
    val spans = byStage.map { case (st, rs) =>
      st -> (rs.map(_._1).min, rs.map(_._1).max) }
    for (st <- 0L until k - 1)
      assert(spans(st)._2 <= spans(st + 1)._1,
        s"stage $st max ${spans(st)._2} > stage ${st + 1} min " +
          s"${spans(st + 1)._1}")
    // equal mass: any stage's token mass is within (total/k + heaviest
    // single length-value's mass) — boundaries land on value
    // boundaries, so that is the exact worst case
    val total = rows.map(_._1).sum
    val maxValueMass = rows.groupBy(_._1)
      .map { case (_, rs) => rs.map(_._1).sum }.max
    for ((st, rs) <- byStage) {
      val mass = rs.map(_._1).sum
      assert(mass <= total / k + maxValueMass,
        s"stage $st mass $mass exceeds ${total / k} + $maxValueMass")
    }
  }

  test("c10: seeded-hash order interleaves sources within a stage " +
    "instead of concatenating them") {
    import spark.implicits._
    // 400 docs, two sources, all the same length: one stage, and a
    // source-ordered layout would give adjacency-same-source ~ 1.0;
    // a mixing order gives ~ 0.5
    val docs = (0 until 400).map { i =>
      (i.toLong, "w " * 9 + "w", if (i < 200) "srcA" else "srcB", 21L)
    }
    val fixDir =
      java.nio.file.Files.createTempDirectory("c10fix").toString
    docs.toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val ordered = operators.LlmOps.c10Curriculum.fn(spark, fixDir)
      .orderBy(col("ord"), col("doc_id")).collect()
      .map(_.getString(1))
    assert(ordered.length === 400)
    val sameAdj = ordered.sliding(2)
      .count(p => p(0) == p(1)).toDouble / (ordered.length - 1)
    assert(sameAdj < 0.65,
      f"adjacent-same-source fraction $sameAdj%.2f — the hash order " +
        "is not interleaving (concatenated layout would read ~1.0)")
    // deterministic: a second run reproduces the exact order
    val again = operators.LlmOps.c10Curriculum.fn(spark, fixDir)
      .orderBy(col("ord"), col("doc_id")).collect().map(_.getString(1))
    assert(again.sameElements(ordered))
  }
}
