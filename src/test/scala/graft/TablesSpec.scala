package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-schema drift tolerance of the events loader.
  *
  * The testdata generator has shipped `ts` as parquet TIMESTAMP(NANOS)
  * (read as BIGINT under nanosAsLong) in some generations and as plain
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ) in
  * others — the round-10 regeneration silently flipped the type and took
  * 13 queries red until the loader became schema-adaptive. At 100 TB
  * this is the normal state of a long-lived lake: files written by
  * different producers over years coexist in one table, so the loader —
  * not the queries — owns physical-type normalization. These specs pin
  * the contract: whatever the file carries, downstream sees one
  * session-zoned TimestampType `ts` at micros resolution, with
  * identical instants across generations.
  */
class TablesSpec extends SparkSuite {

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-tables-$tag").toString

  // one wall-clock instant, sub-millisecond precision to exercise the
  // nanos floor: 2024-03-01 12:34:56.789123456 UTC
  private val MICROS = 1709296496789123L
  private val NANOS = MICROS * 1000 + 456

  test("normalizeEventTs: long nanos floor-divide to the micros instant") {
    import spark.implicits._
    val df = Seq((1L, NANOS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(df.schema("ts").dataType === LongType)
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === MICROS, "nanos must floor to micros, not round")
  }

  test("normalizeEventTs: TIMESTAMP_NTZ reinterprets as the same UTC instant") {
    import spark.implicits._
    val df = Seq((1L, MICROS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // session zone is UTC, so the NTZ wall clock IS the instant
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === MICROS)
  }

  test("normalizeEventTs: NTZ instant survives a non-UTC session zone") {
    // the foreign-session hazard: a bare cast would reinterpret the UTC
    // wall clock in the session zone and shift every instant
    import spark.implicits._
    val df = Seq((1L, MICROS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val got = Tables.normalizeEventTs(df)
        .select(unix_micros(col("ts"))).head().getLong(0)
      assert(got === MICROS,
        "NTZ wall clock must be read as UTC in ANY session zone")
    } finally spark.conf.set(key, saved)
  }

  test("normalizeEventTs: TimestampType passes through untouched") {
    import spark.implicits._
    val df = Seq((1L, MICROS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === MICROS)
  }

  test("events loader yields one canonical ts across parquet generations") {
    import spark.implicits._
    // generation A: ts as epoch-nanos BIGINT (what nanosAsLong yields
    // for a TIMESTAMP(NANOS) file); generation B: ts as TIMESTAMP_NTZ
    // (what the micros regeneration reads as) — same instants
    val dirA = tmp("gen-a")
    val dirB = tmp("gen-b")
    Seq((1L, NANOS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    Seq((1L, MICROS, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    val a = Tables.events(spark, dirA)
    val b = Tables.events(spark, dirB)
    assert(a.schema === b.schema, "generations must converge on one schema")
    assert(a.select(unix_micros(col("ts"))).head().getLong(0) ===
      b.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("events loader aligns column add/drop drift to the canonical schema") {
    import spark.implicits._
    // an "evolved" generation: props dropped, schema_ver added — the
    // column-delta half of lake drift; the loader must null-fill the
    // dropped canonical column and prune the addition
    val dir = tmp("gen-evolved")
    Seq((1L, MICROS, 7L, "view", 1.0, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "schema_ver")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.columns.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val row = out.head()
    assert(row.isNullAt(row.fieldIndex("props")),
      "dropped canonical column must be null-filled, not misread")
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === MICROS)
  }
}
