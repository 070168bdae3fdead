package graft

/** Registry-wide smoke: every query in SparkEntry.queries must plan and
  * execute on sf0.001, return a non-degenerate schema, and (except the
  * known-empty guard query's zero-count cases) produce rows. Catches
  * broken registrations without waiting for the Verify/oracle loop. */
class RegistrySpec extends SparkSuite {

  test("every registered query executes and is non-degenerate at sf0.001") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.schema.fields.nonEmpty, s"$name: empty schema")
        val n = df.count()
        // f3a4_empty_guard intentionally aggregates an empty slice but
        // still emits its single summary row; nothing may return zero
        if (n == 0) failures += s"$name returned 0 rows"
      } catch {
        case e: Exception =>
          failures += s"$name threw ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed:\n  ${failures.mkString("\n  ")}")
  }

  test("every oracle key corresponds to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }
}
