package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** P11 pivot, P6/P7 latlng split + defaults, P8 schema alignment —
  * reference-shaped fixtures per FIXTURES.md A4. */
class ArrayOpsSpec extends SparkSuite {
  import spark.implicits._

  // A4-shaped stream payload: parallel arrays keyed by type, pivoted to
  // columns then exploded to one row per elapsed second
  // (utils.py:352-357 semantics).
  private def streamFixture = Seq(
    (42L, Seq(0L, 1L, 2L), Seq(101L, 103L, 104L),
      Seq(Seq(37.77, -122.41), Seq(37.78, -122.42), Seq(37.79, -122.43))),
    (43L, Seq(0L, 1L), Seq(88L, 90L), null)
  ).toDF("activity_id", "time", "heartrate", "latlng")

  test("P11: arrays_zip + posexplode pivots parallel arrays to rows") {
    val out = streamFixture
      .select(col("activity_id"),
        posexplode(arrays_zip(col("time"), col("heartrate"))))
      .select(col("activity_id"), col("col.time").as("time"),
        col("col.heartrate").as("heartrate"))
    val rows = out.orderBy("activity_id", "time").collect()
    assert(rows.length === 5)
    assert(rows.head === Row(42L, 0L, 101L))
    assert(rows.last === Row(43L, 1L, 90L))
  }

  test("P6/P7: latlng element split with null-array default") {
    // P7 must fire BEFORE the zip: arrays_zip(time, NULL) is NULL and
    // posexplode(NULL) drops the activity's rows entirely. The reference
    // builds a per-row [None, None] for missing latlng (utils.py:362-363);
    // the faithful Spark form defaults the whole column to
    // a same-length array of null pairs first.
    val out = streamFixture
      .withColumn("latlng",
        coalesce(col("latlng"),
          expr("transform(time, x -> CAST(NULL AS ARRAY<DOUBLE>))")))
      .select(col("activity_id"),
        posexplode(arrays_zip(col("time"), col("latlng"))))
      .select(col("activity_id"), col("col.time").as("t"),
        element_at(col("col.latlng"), 1).as("latitude"),
        element_at(col("col.latlng"), 2).as("longitude"))
    val withLatlng = out.filter(col("activity_id") === 42L && col("t") === 0L)
      .collect().head
    assert(withLatlng.getDouble(2) === 37.77)
    assert(withLatlng.getDouble(3) === -122.41)
    // activity 43 has no latlng stream: P7 default yields null lat/lon,
    // but the rows themselves survive
    val noLatlng = out.filter(col("activity_id") === 43L).collect()
    assert(noLatlng.length === 2)
    assert(noLatlng.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("P8: unionByName null-fills declared-but-absent columns") {
    val a = Seq((1L, 10.0)).toDF("id", "watts")
    val b = Seq((2L, 155L)).toDF("id", "heartrate")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.sorted === Array("heartrate", "id", "watts"))
    val byId = u.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(u.columns.indexOf("heartrate")))
    assert(byId(2L).isNullAt(u.columns.indexOf("watts")))
  }

  test("P11 guard: zip of unequal-length arrays pads with null") {
    // Strava's contract says same length; arrays_zip pads, it doesn't
    // silently truncate like pandas positional assignment would
    val df = Seq((Seq(1L, 2L, 3L), Seq(9L))).toDF("a", "b")
      .select(posexplode(arrays_zip(col("a"), col("b"))))
      .select(col("col.a"), col("col.b"))
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.count(_.isNullAt(1)) === 2)
  }
}
