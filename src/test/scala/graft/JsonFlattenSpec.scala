package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** P4/P5 JSON flatten over the reference-shaped canned payloads
  * (FIXTURES.md A1/A2) — declared schema + explode, no inference. */
class JsonFlattenSpec extends SparkSuite {
  import spark.implicits._

  private def ddl(s: String): StructType =
    DataType.fromDDL(s).asInstanceOf[StructType]

  test("A1: generic intraday dataset list flattens to {time, value} rows") {
    // fitbit_utils.py:374-379 shape
    val payload =
      """{"activities-steps-intraday": {"dataset": [
        {"time": "00:00:00", "value": 0},
        {"time": "00:01:00", "value": 12}
      ], "datasetInterval": 1, "datasetType": "minute"}}"""
    val schema = ddl(
      """`activities-steps-intraday` STRUCT<
           dataset: ARRAY<STRUCT<time: STRING, value: BIGINT>>,
           datasetInterval: INT, datasetType: STRING>""")
    val out = Seq(payload).toDF("js")
      .select(explode(from_json(col("js"), schema)
        .getField("activities-steps-intraday").getField("dataset")).as("r"))
      .select(col("r.time"), col("r.value"))
      .withColumn("datetime",
        to_timestamp(concat_ws(" ", lit("2024-06-01"), col("time"))))
      .withColumn("date", lit("2024-06-01"))
    val rows = out.orderBy("time").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "00:00:00" && rows(0).getLong(1) === 0L)
    assert(rows(1).getLong(1) === 12L)
    assert(rows(1).getTimestamp(2).toString === "2024-06-01 00:01:00.0")
  }

  test("A2: AZM nested minutes flatten (P4) with time-of-day derivation") {
    // fitbit_utils.py:353-370 shape: value is itself a struct
    val payload =
      """{"activities-active-zone-minutes-intraday": [
        {"dateTime": "2024-06-01", "minutes": [
          {"minute": "2024-06-01T00:03:00",
           "value": {"activeZoneMinutes": 1}},
          {"minute": "2024-06-01T00:07:00",
           "value": {"activeZoneMinutes": 2}}
        ]}]}"""
    val schema = ddl(
      """`activities-active-zone-minutes-intraday` ARRAY<STRUCT<
           dateTime: STRING,
           minutes: ARRAY<STRUCT<minute: STRING,
             value: STRUCT<activeZoneMinutes: BIGINT>>>>>""")
    val out = Seq(payload).toDF("js")
      .select(explode(from_json(col("js"), schema)
        .getField("activities-active-zone-minutes-intraday")).as("day"))
      .select(col("day.dateTime").as("date"),
        explode(col("day.minutes")).as("m"))
      .select(col("date"),
        col("m.value.activeZoneMinutes").as("value"),
        date_format(to_timestamp(col("m.minute")), "HH:mm:ss").as("time"))
    val rows = out.orderBy("time").collect()
    assert(rows.map(r => (r.getString(2), r.getLong(1))).toSeq ===
      Seq(("00:03:00", 1L), ("00:07:00", 2L)))
    assert(rows.forall(_.getString(0) === "2024-06-01"))
  }

  test("empty dataset list (F3 guard) yields zero rows, not a crash") {
    val payload = """{"activities-steps-intraday": {"dataset": []}}"""
    val schema = ddl(
      """`activities-steps-intraday` STRUCT<
           dataset: ARRAY<STRUCT<time: STRING, value: BIGINT>>>""")
    val out = Seq(payload).toDF("js")
      .select(explode(from_json(col("js"), schema)
        .getField("activities-steps-intraday").getField("dataset")).as("r"))
    assert(out.count() === 0)
  }
}
