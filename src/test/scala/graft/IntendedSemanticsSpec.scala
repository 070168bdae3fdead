package graft

import org.apache.spark.sql.functions._

/** Regression tests pinning the INTENDED semantics where the reference
  * has defects (SURVEY §2.12.3–4): cached+fresh union, and exact-key
  * matching instead of substring membership. */
class IntendedSemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("P9: nested SummaryActivity shape — struct athlete/map, latlng arrays") {
    import org.apache.spark.sql.types._
    // the registered p9_normalize_full flattens only at the RESULT edge
    // (driver comparator can't sort dicts/lists); the operator's real
    // output keeps the reference's nested shape (utils.py:93-233)
    val nested = sources.Ingest.p9FullNested(spark, sf)
    val athlete = nested.schema("athlete").dataType.asInstanceOf[StructType]
    assert(athlete.fieldNames.toSeq === Seq("id", "resource_state"))
    val m = nested.schema("map").dataType.asInstanceOf[StructType]
    assert(m.fieldNames.toSeq ===
      Seq("id", "summary_polyline", "resource_state"))
    assert(nested.schema("start_latlng").dataType ===
      ArrayType(DoubleType, containsNull = true))
    assert(nested.schema("end_latlng").dataType ===
      ArrayType(DoubleType, containsNull = true))
    // 47 reference TypedDict fields + the synthesized extras
    assert(nested.schema.fields.length >= 47)
    // flattened registered output carries the same values, one level up
    val flat = sources.Ingest.p9NormalizeFull.fn(spark, sf)
    val a = nested.select(col("id"), col("athlete.id").as("aid"))
      .orderBy(col("id")).limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = flat.select(col("id"), col("athlete_id"))
      .orderBy(col("id")).limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("§2.12.3: cached + fresh are BOTH in the returned union") {
    // reference bug: cached stream files are read then dropped from the
    // union (utils.py:411-417). Intent: requested = cached ∪ fetched.
    val requested = Seq(10L, 11L, 12L).toDF("id")
    val cached = Seq((10L, "cached")).toDF("id", "src")
    val fetchedIds = requested.join(cached, Seq("id"), "left_anti")
    val fetched = fetchedIds.withColumn("src", lit("fetched"))
    val result = cached.unionByName(fetched)
    val bySrc = result.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bySrc === Map(10L -> "cached", 11L -> "fetched", 12L -> "fetched"))
  }

  test("semi ∪ anti partitions the requested set exactly") {
    val requested = Seq(1L, 2L, 3L, 4L).toDF("id")
    val existing = Seq(2L, 4L, 9L).toDF("id")
    val semi = requested.join(existing, Seq("id"), "left_semi")
    val anti = requested.join(existing, Seq("id"), "left_anti")
    assert(semi.count() + anti.count() === requested.count())
    assert(semi.intersect(anti).count() === 0)
    assert(semi.union(anti).except(requested).count() === 0)
  }

  test("§2.12.4: exact parsed-key match, not substring membership") {
    // reference bug: `str(123) in key` also matches stream_1234
    // (utils.py:412). Intent: equality on the parsed id.
    val keys = Seq("lake/streams/strava_stream_123.parquet",
      "lake/streams/strava_stream_1234.parquet").toDF("key")
    val wanted = Seq(123L).toDF("id")
    val exact = keys
      .withColumn("fid",
        regexp_extract(col("key"), "strava_stream_(\\d+)\\.parquet", 1)
          .cast("long"))
      .join(wanted, col("fid") === col("id"), "left_semi")
    assert(exact.collect().map(_.getString(0)) ===
      Array("lake/streams/strava_stream_123.parquet"))
    // the buggy substring predicate would keep both:
    val substringMatch = keys.join(wanted, col("key").contains(col("id")))
    assert(substringMatch.count() === 2)
  }

  test("§2.12.5: empty listing behaves as empty relation, not a crash") {
    val empty = spark.emptyDataFrame.withColumn("key", lit(""))
      .filter(lit(false)).select("key")
    val worklist = Seq("k1", "k2").toDF("key")
    assert(worklist.join(empty, Seq("key"), "left_anti").count() === 2)
  }
}
