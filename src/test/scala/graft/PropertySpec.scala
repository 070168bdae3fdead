package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over the core set-operation invariants (SURVEY §5.3),
  * driven by ScalaCheck generators with a fixed seed (deterministic, no
  * scalatestplus bridge needed). The properties are about SEMANTICS
  * (row counts, partitions), so small generated frames suffice. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val idLists: Gen[List[Long]] =
    Gen.listOfN(30, Gen.chooseNum(0L, 20L))

  /** Deterministic sample stream from a fixed seed. */
  private def samples(n: Int): Seq[(List[Long], List[Long])] =
    (0 until n).map { i =>
      val p = Gen.zip(idLists, idLists)
        .pureApply(Gen.Parameters.default, Seed(42L + i))
      p
    }

  test("U1: union row count is the sum of input row counts") {
    samples(10).foreach { case (xs, ys) =>
      assert(xs.toDF("id").unionByName(ys.toDF("id")).count() ===
        xs.length + ys.length)
    }
  }

  test("J2/J3: anti ∪ semi partitions the work-list for ANY existing set") {
    samples(10).foreach { case (xs, ys) =>
      val work = xs.distinct.toDF("id")
      val existing = ys.toDF("id")
      val semi = work.join(existing, Seq("id"), "left_semi")
      val anti = work.join(existing, Seq("id"), "left_anti")
      assert(semi.count() + anti.count() === xs.distinct.length)
      assert(semi.intersect(anti).count() === 0)
    }
  }

  test("A3: distinct is idempotent and bounded by input size") {
    samples(10).foreach { case (xs, _) =>
      val d = xs.toDF("id").distinct()
      assert(d.count() === xs.distinct.length)
      assert(d.distinct().count() === d.count())
    }
  }
}
