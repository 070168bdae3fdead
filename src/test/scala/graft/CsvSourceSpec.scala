package graft

import org.apache.spark.sql.functions._

/** S12 CSV source: the quarantine contract — a malformed field routes
  * the ROW to the dead-letter group without killing the task or
  * polluting the surviving aggregate — pinned on a hand-written CSV
  * (not the fixture generator, so writer and reader are independent).
  * Also pins the pruning caveat: Spark's CSV parser only parses the
  * columns a query READS, so _corrupt_record fires per read schema,
  * not per file — a quarantine count is only stable if the query
  * reads every contract column (s12's planted corruption sits in
  * o_totalprice, which its aggregate always reads). */
class CsvSourceSpec extends SparkSuite {

  private def parsed(dir: String) = spark.read
    .schema(org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, _corrupt_record STRING"))
    .option("mode", "PERMISSIVE")
    .option("columnNameOfCorruptRecord", "_corrupt_record")
    .csv(dir)

  private def writeCsv(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("s12fix")
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("S12: malformed rows quarantine; clean rows aggregate exactly") {
    val dir = writeCsv(Seq(
      "1,10,O,100.50",
      "2,20,F,200.25",
      "3,30,O,NA", // malformed price -> quarantine
      "4,40,F,50.25",
      "5,50,O,x10", // malformed price -> quarantine
      "6,60,P,7.00"))
    val out = parsed(dir)
      .groupBy(when(col("_corrupt_record").isNotNull, lit("__corrupt__"))
        .otherwise(col("o_orderstatus")).as("st"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_corrupt_record").isNull,
          col("o_totalprice").cast("decimal(18,2)")))
          .cast("double").as("rev"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.toString)))).toMap
    assert(out("__corrupt__") === ((2L, None)),
      "both malformed rows quarantine with a null aggregate")
    assert(out("O") === ((1L, Some("100.5"))), "clean O rows")
    assert(out("F") === ((2L, Some("250.5"))), "clean F rows")
    assert(out("P") === ((1L, Some("7.0"))), "clean P row")
    // the quarantined ROWS retain their raw line for the dead-letter
    // sink — the actual replay artifact a pipeline needs. The select
    // must READ the malformed column (o_totalprice): the pruning
    // caveat below applies to the dead-letter query itself
    val raw = parsed(dir).filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"), col("o_totalprice"))
      .collect().map(_.getString(0)).toSet
    assert(raw === Set("3,30,O,NA", "5,50,O,x10"))
  }

  test("S12: corrupt detection follows the READ schema, not the file " +
    "(the pruning caveat the operator's contract columns avoid)") {
    val dir = writeCsv(Seq("1,10,O,100.50", "bad,20,F,3.25"))
    // query reads only status+price: the malformed KEY is never
    // parsed, so the row passes as clean — silently
    val pruned = parsed(dir)
      .groupBy(when(col("_corrupt_record").isNotNull, lit("__corrupt__"))
        .otherwise(col("o_orderstatus")).as("st"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!pruned.contains("__corrupt__"),
      "a bad value in an unread column does NOT quarantine")
    // the same file with the key read: the row quarantines
    val full = parsed(dir)
      .groupBy(when(col("_corrupt_record").isNotNull, lit("__corrupt__"))
        .otherwise(col("o_orderstatus")).as("st"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full("__corrupt__") === 1L,
      "the same bad value quarantines once its column is read")
  }

  test("S12: the registered query's quarantine count equals the " +
    "planted corruption rule") {
    val rows = sources.Ingest.s12CsvSource.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 13 === 0).count()
    assert(rows("__corrupt__") === want,
      "every planted-corrupt row lands in quarantine, nothing else")
    val total = Tables.orders(spark, sf).count()
    assert(rows.values.sum === total, "no row is dropped or duplicated")
  }
}
