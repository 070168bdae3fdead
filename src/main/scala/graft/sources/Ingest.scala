package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Tables._

/** Write path (sinks K1–K3, K5) and the E1 ingest restatement, plus the
  * file-catalog queries (S5/F5) — SURVEY.md §2.2, §3.
  *
  * The reference's sink is `pq.write_table` one file per (resource, day)
  * with the partition encoded in the file NAME
  * (services/fitbit/fitbit_utils.py:285-287, path built :227-228). The
  * Spark-native restatement uses real Hive partitions
  * (`partitionBy(...)`), which is what makes partition PRUNING work on
  * the read side at 100 TB — a filter on the partition column prunes
  * directories before any I/O.
  *
  * Sink queries write under target/graft-lake/ (wiped per run), read the
  * lake back, and return the read-back frame, so the oracle checks the
  * full write→read round trip, not just the in-memory derivation.
  */
object Ingest {

  /** Lake root for all sink queries: overridable via -Dgraft.lake.dir,
    * else <cwd>/target/graft-lake — no hardcoded checkout path. */
  private[graft] lazy val lakeRoot: String =
    sys.props.getOrElse("graft.lake.dir",
      Paths.get(sys.props("user.dir"), "target", "graft-lake").toString)

  private[graft] def freshDir(sub: String): String = {
    val p = Paths.get(lakeRoot, sub)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(p.toFile)
    Files.createDirectories(p.getParent)
    p.toString
  }

  // ---------------------------------------------------------------------
  // K1: partitioned parquet sink — derive (P1/P2 analogue), write with
  // partitionBy(event_date), read the lake back. Partition values live in
  // directory names; the read-back plan partition-prunes on event_date.
  // Ref: fitbit_utils.py:285-287 (one file per (resource, day)).
  // ---------------------------------------------------------------------
  val k1PartitionedSink = Q(
    "k1_partitioned_sink",
    (s, d) => {
      val out = freshDir("k1")
      events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), to_date(col("ts")).as("event_date"))
        // co-locate each Hive partition in one task before the write:
        // otherwise every task writes a sliver of every partition and the
        // lake ends up with tasks×partitions small files — the classic
        // small-files failure at scale
        .repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      s.read.parquet(out)
    },
    Some("""SELECT event_id, user_id, event_type, value,
      CAST(ts AS DATE) AS event_date FROM events"""))

  // ---------------------------------------------------------------------
  // K2: date-stamped snapshot sink — one self-contained snapshot per run
  // under a date-stamped path (fixed date literal: the oracle must be
  // run-date independent). Ref: get_activity_data.py:28-34.
  // ---------------------------------------------------------------------
  val k2SnapshotSink = Q(
    "k2_snapshot_sink",
    (s, d) => {
      val out = freshDir("k2/all_orders_2025-06-01.parquet")
      orders(s, d)
        .withColumn("snapshot_date", lit("2025-06-01"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    },
    Some("SELECT *, '2025-06-01' AS snapshot_date FROM orders"))

  // ---------------------------------------------------------------------
  // E1: the full Fitbit-intraday ingest restated end-to-end — seed the
  // lake with everything before a cutoff, then run the incremental load:
  //   work-list (all (event_type, day) partitions in the source)
  //   ANTI-JOIN already-materialized lake partitions        (K4/J2)
  //   → fetch only the missing rows (semi-join)             (F4)
  //   → append into the partitioned lake                    (K1)
  // and finally read the whole lake back and count per partition. Green
  // means the incremental pass wrote exactly the missing partitions —
  // idempotence by construction, distributed (no driver-side membership
  // loop like fitbit_utils.py:224-232). Ref: SURVEY §3 E1.
  // ---------------------------------------------------------------------
  val e1IngestIncremental = Q(
    "e1_ingest_incremental",
    (s, d) => {
      val out = freshDir("e1")
      val src = events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"), to_date(col("ts")).as("event_date"))
      // seed: "previous runs" ingested everything before the cutoff
      // (scaffolding for the incremental run — written as-is, no extra
      // shuffle; only the product path below pays for file co-location).
      // Events span 2024-01-01..2024-01-30 at every SF, so a mid-range
      // cutoff leaves roughly half the partitions genuinely missing —
      // the incremental path must do real work for the counts to match.
      src.filter(col("event_date") < lit("2024-01-15"))
        .write.mode("overwrite")
        .partitionBy("event_type", "event_date").parquet(out)
      // incremental run over the FULL source range:
      val worklist = src.select("event_type", "event_date").distinct()
      val existing = s.read.parquet(out)
        .select("event_type", "event_date").distinct()
      val missing = worklist.join(existing,
        Seq("event_type", "event_date"), "left_anti")
      src.join(broadcast(missing), Seq("event_type", "event_date"),
          "left_semi")
        .repartition(col("event_type"), col("event_date"))
        .write.mode("append")
        .partitionBy("event_type", "event_date").parquet(out)
      // verify the lake: per-partition counts must equal the source's
      s.read.parquet(out)
        .groupBy(col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT event_type, CAST(ts AS DATE) AS event_date,
      count(*) AS n FROM events GROUP BY event_type, CAST(ts AS DATE)"""))

  // ---------------------------------------------------------------------
  // P4/P5 at full fidelity: flatten a nested JSON document — from_json
  // with a DECLARED schema (no inference pass at 100 TB), then explode
  // the inner record list, one output row per element. The JSON docs are
  // built per-order from lineitem so the oracle is the plain relational
  // answer. Ref: fitbit_utils.py:374-379 (the dataset-list flatten).
  //
  // The fixture (collect_list + to_json synthesis) is materialized ONCE
  // per (JVM, dataset dir) into the lake, OUTSIDE the registered query —
  // r2's bench charged 8.3 s of scaffolding to what is really a
  // from_json+explode operator (VERDICT r2 What's-wrong 3).
  // ---------------------------------------------------------------------
  // Memoized once per (JVM, fixture-name, dataset dir). The on-disk dir
  // is keyed by an md5 of the RAW dataset path (two paths that sanitize
  // identically can't collide — ADVICE r3), and the build runs under a
  // coarse lock so concurrent first calls can't interleave one caller's
  // freshDir wipe with another's write. Not invalidated if the dataset
  // files change within a JVM (documented trade: fixtures are
  // deterministic functions of the dataset dir, which the harness never
  // mutates mid-run).
  private val fixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val fixtureLock = new Object

  private def memoFixture(fixture: String, d: String)(
      build: String => Unit): String = {
    val memoKey = s"$fixture|$d"
    // lock-free fast path: a memoized fixture must not block behind an
    // unrelated in-flight build (the lock guards BUILDS only)
    fixtureDirs.get(memoKey).getOrElse {
      fixtureLock.synchronized {
        fixtureDirs.getOrElseUpdate(memoKey, {
          val out = freshDir(s"$fixture/${datasetKey(d)}")
          build(out)
          out
        })
      }
    }
  }

  /** md5 of a dataset dir path — collision-free directory keying for
    * per-dataset outputs (two paths that SANITIZE identically can't
    * collide; ADVICE r3). */
  private def datasetKey(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Exposed (private[graft]) so Bench pre-materializes it in the warmup
    * block — r3's bench charged the fixture build to the measured query
    * in a fresh JVM (VERDICT r3 What's-wrong 1). */
  private[graft] def p4DocsFixture(s: SparkSession, d: String): String =
    memoFixture("p4_docs", d) { out =>
      lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(to_json(expr(
          """named_struct('dataset',
             sort_array(collect_list(named_struct(
               'ln', l_linenumber, 'qty', l_quantity))))"""))
          .as("js"))
        .write.mode("overwrite").parquet(out)
    }

  val p4JsonFlatten = Q(
    "p4_json_flatten",
    (s, d) =>
      s.read.parquet(p4DocsFixture(s, d))
        .select(col("l_orderkey"),
          explode(from_json(col("js"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "dataset ARRAY<STRUCT<ln: INT, qty: DOUBLE>>"))
            .getField("dataset")).as("r"))
        .select(col("l_orderkey"), col("r.ln").as("ln"),
          col("r.qty").as("qty")),
    Some("""SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
      FROM lineitem"""))

  // ---------------------------------------------------------------------
  // P4b: the AZM two-level nested flatten, oracle-checked — the
  // reference's active-zone-minutes shape is a list of
  // {minute, value: {activeZoneMinutes}} records (fitbit_utils.py:353-372:
  // `mv["value"]["activeZoneMinutes"]`), one level deeper than the generic
  // dataset shape p4 covers. Same declared-schema from_json + explode, but
  // the projection digs through the INNER struct — r3 covered this shape
  // only in JsonFlattenSpec; this registers it against the hash oracle
  // (VERDICT r3 next-round item 4).
  // ---------------------------------------------------------------------
  private[graft] def p4bAzmFixture(s: SparkSession, d: String): String =
    memoFixture("p4b_azm", d) { out =>
      lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(to_json(expr(
          """named_struct('dataset',
             sort_array(collect_list(named_struct(
               'minute', l_linenumber,
               'value', named_struct('activeZoneMinutes', l_quantity)))))"""))
          .as("js"))
        .write.mode("overwrite").parquet(out)
    }

  val p4bAzmFlatten = Q(
    "p4b_azm_flatten",
    (s, d) =>
      s.read.parquet(p4bAzmFixture(s, d))
        .select(col("l_orderkey"),
          explode(from_json(col("js"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "dataset ARRAY<STRUCT<minute: INT, " +
                "value: STRUCT<activeZoneMinutes: DOUBLE>>>"))
            .getField("dataset")).as("r"))
        .select(col("l_orderkey"), col("r.minute").as("minute"),
          col("r.value.activeZoneMinutes").as("azm")),
    Some("""SELECT l_orderkey, l_linenumber AS minute, l_quantity AS azm
      FROM lineitem"""))

  // ---------------------------------------------------------------------
  // S9: JSON-lines file source with a DECLARED schema — the third source
  // family (parquet scan S1, REST DSv2 S2-S4, and now semi-structured
  // files): the landing format REST ingests actually persist before
  // compaction (the reference holds raw API JSON in memory,
  // fitbit_utils.py:266-268; a lake pipeline spills it as JSONL). The
  // schema is declared, NOT inferred — inference is a full extra pass
  // over 100 TB before the real one. Filter + projection run post-parse
  // (JSON rows don't push down like parquet; the lesson S1 teaches in
  // reverse, which is why K1 compacts to parquet).
  // ---------------------------------------------------------------------
  private[graft] def s9JsonlFixture(s: SparkSession, d: String): String =
    memoFixture("s9_jsonl", d) { out =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .write.mode("overwrite").json(out)
    }

  val s9JsonlSource = Q(
    "s9_jsonl_source",
    (s, d) =>
      s.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, " +
            "o_orderstatus STRING, o_totalprice DOUBLE"))
        .json(s9JsonlFixture(s, d))
        .filter(col("o_orderstatus") === "O")
        // o_totalprice passes through unrounded: Spark's JSON writer
        // emits the shortest round-trip repr, so the double read back
        // is bit-identical to the parquet value the oracle reads
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("total")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice AS total
      FROM orders WHERE o_orderstatus = 'O'"""))

  // ---------------------------------------------------------------------
  // S12: CSV file source with a DECLARED schema and a dead-letter
  // quarantine — the fourth source family (parquet S1, REST DSv2
  // S2-S4, JSONL S9): partner/export feeds still land as CSV, and the
  // two production rules are (a) schema DECLARED, never inferred (an
  // inference pass is a full extra read of 100 TB), and (b) a
  // malformed row becomes a QUARANTINE row via PERMISSIVE mode's
  // _corrupt_record, never a task-killing exception — the m2 decode
  // discipline applied to a text format. The fixture plants a
  // deterministic corruption (every o_orderkey % 13 == 0 row carries
  // a non-numeric price), so the oracle restates both the surviving
  // aggregate and the quarantine count from the parquet truth.
  //
  // Revenue accumulates in DECIMAL(18,2) and casts to double at the
  // edge (the q1 rule): the CSV round-trips prices as their exact
  // 2-dp rendering, so both engines aggregate the identical decimals.
  // ---------------------------------------------------------------------
  private[graft] def s12CsvFixture(s: SparkSession, d: String): String =
    memoFixture("s12_csv", d) { out =>
      orders(s, d).select(concat_ws(",",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 13 === 0, lit("NA"))
          .otherwise(col("o_totalprice").cast("decimal(18,2)")
            .cast("string"))).as("value"))
        .write.mode("overwrite").text(out)
    }

  val s12CsvSource = Q(
    "s12_csv_source",
    (s, d) => {
      val parsed = s.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, " +
            "o_orderstatus STRING, o_totalprice DOUBLE, " +
            "_corrupt_record STRING"))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(s12CsvFixture(s, d))
      // ONE pass routes rows to their status or the quarantine group
      // (Spark refuses a plan whose only referenced source column is
      // _corrupt_record, and a second pass would re-read the files
      // anyway); corrupt rows keep their parseable fields, but route
      // on corruptness, not the possibly-half-parsed status
      parsed
        .groupBy(when(col("_corrupt_record").isNotNull, lit("__corrupt__"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("_corrupt_record").isNull,
            col("o_totalprice").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
    },
    Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS revenue
      FROM orders WHERE o_orderkey % 13 <> 0
      GROUP BY o_orderstatus
      UNION ALL
      SELECT '__corrupt__' AS o_orderstatus,
        CAST(count(*) AS BIGINT) AS n_rows, CAST(NULL AS DOUBLE)
          AS revenue
      FROM orders WHERE o_orderkey % 13 = 0"""))

  // ---------------------------------------------------------------------
  // S13: binary-file source — the media lake's front door (the fifth
  // source family: parquet S1, REST DSv2 S2-S4, JSONL S9, CSV S12):
  // `spark.read.format("binaryFile")` over a directory of opaque blobs,
  // which is how image/audio corpora actually arrive before anyone
  // compacts them to parquet (m1-m6 then operate on the binary column).
  // Production rules demonstrated: (a) identity comes from the PATH
  // (the only metadata a blob store guarantees), parsed once per file;
  // (b) format comes from CONTENT sniffing (magic bytes), never the
  // extension — the fixture plants files whose magic disagrees with
  // what their id would suggest (id % 5 == 0 carries garbage magic),
  // and those route to '__unknown__' instead of killing the task (the
  // m2/s12 quarantine discipline); (c) an integrity hash is computed
  // in the SAME scan — no second read of 100 TB of blobs. Scale shape:
  // zero shuffles — one distributed file scan, per-row projections;
  // pathGlobFilter prunes non-blob droppings at listing time, before
  // any task reads a byte. modificationTime is real but nondeterministic
  // — it stays out of the result on purpose.
  // ---------------------------------------------------------------------
  private[graft] def s13BinFixture(s: SparkSession, d: String): String =
    memoFixture("s13_bin", d) { out =>
      // one blob per document, written task-side (no driver loop):
      // magic || utf8(text), so every byte is derivable from the
      // parquet truth the oracle reads
      {
        import s.implicits._
        Files.createDirectories(Paths.get(out))
        documents(s, d)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0, lit("XXXX"))
              .when(col("doc_id") % 2 === 0, lit("PNG1"))
              .otherwise(lit("WAV1")).as("magic"),
            col("text"))
          .as[(Long, String, String)]
          .foreachPartition { it: Iterator[(Long, String, String)] =>
            it.foreach { case (id, magic, text) =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(out, s"doc_$id.bin"),
                (magic + text).getBytes("UTF-8")): Unit
            }
          }
      }
      // a non-blob dropping the glob must prune at listing time
      Files.write(Paths.get(out, "_manifest.json"),
        "{\"n\": -1}".getBytes("UTF-8")): Unit
    }

  val s13BinarySource = Q(
    "s13_binary_source",
    (s, d) =>
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(s13BinFixture(s, d))
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
            .cast("long").as("doc_id"),
          expr("decode(substring(content, 1, 4), 'UTF-8')").as("magic"),
          col("length").as("n_bytes"),
          expr("CAST(conv(substring(md5(content), 1, 15), 16, 10) " +
            "AS BIGINT)").as("h"))
        .select(col("doc_id"),
          when(col("magic") === "PNG1", lit("png"))
            .when(col("magic") === "WAV1", lit("wav"))
            .otherwise(lit("__unknown__")).as("fmt"),
          col("n_bytes"), col("h")),
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN '__unknown__'
             WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS fmt,
        CAST(4 + strlen(text) AS BIGINT) AS n_bytes,
        CAST('0x' || substring(md5(
          (CASE WHEN doc_id % 5 = 0 THEN 'XXXX'
                WHEN doc_id % 2 = 0 THEN 'PNG1' ELSE 'WAV1' END) || text),
          1, 15) AS BIGINT) AS h
      FROM documents"""))

  // ---------------------------------------------------------------------
  // P9 full fidelity: wide normalization with nested structs + defaults —
  // the 47-field SummaryActivity shape (utils.py:146-233) restated: direct
  // picks, deterministic synthesized gaps, coalesce() defaults (False /
  // 'everyone' / 0), rebuilt nested athlete/map structs with exactly the
  // declared fields, and the has_heartrate CASE-WHEN (P10,
  // utils.py:157-159). The NESTED form (struct athlete/map, latlng
  // arrays) is the operator's real output — IngestSpec pins its schema;
  // the registered query flattens struct/array columns to scalars at the
  // result edge because the driver's comparator sorts columns in pandas,
  // where dicts and lists aren't sortable (CORRECTNESS_r02).
  // ---------------------------------------------------------------------
  def p9FullNested(s: SparkSession, d: String): DataFrame = {
      // raw view with deterministic nulls, standing in for API records
      // with missing optional keys (the reference's .get(..., default))
      val raw = orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_custkey"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("name_raw"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("visibility_raw"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("distance_raw"),
        (col("o_orderkey") % 2 === 0).as("has_heartrate"),
        (col("o_orderkey") % 11 === 0).as("no_latlng"),
        col("o_totalprice").as("p"),
        to_date(col("o_orderdate")).as("od"))
      raw.select(
        // the full SummaryActivity shape (FIXTURES.md A3 / utils.py:93-233):
        // direct picks, defaults (false / 'everyone' / 0 / true / null),
        // nested athlete/map structs, latlng arrays with the null default,
        // and the has_heartrate conditional-null pair (P10)
        lit(2).as("resource_state"),
        struct((col("o_custkey") + 100000).as("id"),
          lit(2).as("resource_state")).as("athlete"),
        coalesce(col("name_raw"), lit("unknown")).as("name"),
        coalesce(col("distance_raw"), lit(0.0)).as("distance"),
        (col("id") % 7200).as("moving_time"),
        (col("id") % 7200 + 60).as("elapsed_time"),
        round(col("p") / 100.0, 4).as("total_elevation_gain"),
        lit("Run").as("type"),
        lit("Run").as("sport_type"),
        lit(0).as("workout_type"),
        col("id"),
        concat(date_format(col("od"), "yyyy-MM-dd"), lit("T00:00:00Z"))
          .as("start_date"),
        concat(date_format(col("od"), "yyyy-MM-dd"), lit("T00:00:00Z"))
          .as("start_date_local"),
        lit("(GMT+00:00) UTC").as("timezone"),
        lit(0.0).as("utc_offset"),
        lit(null).cast("string").as("location_city"),
        lit(null).cast("string").as("location_state"),
        lit(null).cast("string").as("location_country"),
        (col("id") % 5).cast("int").as("achievement_count"),
        (col("id") % 30).cast("int").as("kudos_count"),
        (col("id") % 4).cast("int").as("comment_count"),
        lit(1).as("athlete_count"),
        (col("id") % 3).cast("int").as("photo_count"),
        struct(concat(lit("m"), col("id")).as("id"),
          when(col("no_latlng"), lit("")).otherwise(lit("poly"))
            .as("summary_polyline"),
          lit(2).as("resource_state")).as("map"),
        lit(false).as("trainer"),
        lit(false).as("commute"),
        lit(true).as("manual"),
        lit(false).as("private"),
        coalesce(col("visibility_raw"), lit("everyone")).as("visibility"),
        lit(false).as("flagged"),
        lit(null).cast("string").as("gear_id"),
        when(col("no_latlng"),
          array(lit(null).cast("double"), lit(null).cast("double")))
          .otherwise(array(round(pmod(col("p"), lit(180)) - 90.0, 4),
            round(pmod(col("p") * 2, lit(360)) - 180.0, 4)))
          .as("start_latlng"),
        when(col("no_latlng"),
          array(lit(null).cast("double"), lit(null).cast("double")))
          .otherwise(array(round(pmod(col("p") + 1, lit(180)) - 90.0, 4),
            round(pmod(col("p") * 2 + 1, lit(360)) - 180.0, 4)))
          .as("end_latlng"),
        round((col("p") + 7.0) / 100.0, 4).as("average_speed"),
        round((col("p") + 13.0) / 100.0, 4).as("max_speed"),
        col("has_heartrate"),
        when(col("has_heartrate"), (col("id") % 60 + 90).cast("double"))
          .otherwise(lit(null)).as("average_heartrate"),
        when(col("has_heartrate"), (col("id") % 60 + 120).cast("double"))
          .otherwise(lit(null)).as("max_heartrate"),
        lit(false).as("heartrate_opt_out"),
        lit(false).as("display_hide_heartrate_option"),
        round(pmod(col("p"), lit(500)), 4).as("elev_high"),
        round(pmod(col("p"), lit(100)), 4).as("elev_low"),
        (col("id") + 9000000L).as("upload_id"),
        (col("id") + 9000000L).cast("string").as("upload_id_str"),
        concat(lit("ext_"), col("id")).as("external_id"),
        lit(false).as("from_accepted_tag"),
        (col("id") % 2).cast("int").as("pr_count"),
        (col("id") % 3).cast("int").as("total_photo_count"),
        lit(false).as("has_kudoed"),
        when(col("has_heartrate"), (col("id") % 200).cast("double"))
          .otherwise(lit(null)).as("suffer_score"))
  }

  val p9NormalizeFull = Q(
    "p9_normalize_full",
    (s, d) =>
      // result edge: structs → dotted scalar picks, latlng arrays →
      // element scalars; the nested operator output is p9FullNested
      p9FullNested(s, d)
        .withColumn("athlete_id", col("athlete.id"))
        .withColumn("athlete_resource_state", col("athlete.resource_state"))
        .withColumn("map_id", col("map.id"))
        .withColumn("map_summary_polyline", col("map.summary_polyline"))
        .withColumn("map_resource_state", col("map.resource_state"))
        .withColumn("start_lat", element_at(col("start_latlng"), 1))
        .withColumn("start_lng", element_at(col("start_latlng"), 2))
        .withColumn("end_lat", element_at(col("end_latlng"), 1))
        .withColumn("end_lng", element_at(col("end_latlng"), 2))
        .drop("athlete", "map", "start_latlng", "end_latlng"),
    Some("""WITH raw AS (
        SELECT o_orderkey AS id, o_custkey,
          CASE WHEN o_orderkey % 7 = 0 THEN NULL
               ELSE o_orderpriority END AS name_raw,
          CASE WHEN o_orderkey % 5 = 0 THEN NULL
               ELSE o_orderstatus END AS visibility_raw,
          CASE WHEN o_orderkey % 3 = 0 THEN NULL
               ELSE o_totalprice END AS distance_raw,
          o_orderkey % 2 = 0 AS has_heartrate,
          o_orderkey % 11 = 0 AS no_latlng,
          o_totalprice AS p,
          CAST(o_orderdate AS DATE) AS od
        FROM orders)
      SELECT
        2 AS resource_state,
        o_custkey + 100000 AS athlete_id,
        2 AS athlete_resource_state,
        coalesce(name_raw, 'unknown') AS name,
        coalesce(distance_raw, 0.0) AS distance,
        id % 7200 AS moving_time,
        id % 7200 + 60 AS elapsed_time,
        round(p / 100.0, 4) AS total_elevation_gain,
        'Run' AS type, 'Run' AS sport_type, 0 AS workout_type, id,
        strftime(od, '%Y-%m-%d') || 'T00:00:00Z' AS start_date,
        strftime(od, '%Y-%m-%d') || 'T00:00:00Z' AS start_date_local,
        '(GMT+00:00) UTC' AS timezone,
        CAST(0.0 AS DOUBLE) AS utc_offset,
        CAST(NULL AS VARCHAR) AS location_city,
        CAST(NULL AS VARCHAR) AS location_state,
        CAST(NULL AS VARCHAR) AS location_country,
        CAST(id % 5 AS INTEGER) AS achievement_count,
        CAST(id % 30 AS INTEGER) AS kudos_count,
        CAST(id % 4 AS INTEGER) AS comment_count,
        1 AS athlete_count,
        CAST(id % 3 AS INTEGER) AS photo_count,
        'm' || id AS map_id,
        CASE WHEN no_latlng THEN '' ELSE 'poly' END
          AS map_summary_polyline,
        2 AS map_resource_state,
        false AS trainer, false AS commute, true AS manual,
        false AS private,
        coalesce(visibility_raw, 'everyone') AS visibility,
        false AS flagged, CAST(NULL AS VARCHAR) AS gear_id,
        CASE WHEN no_latlng THEN CAST(NULL AS DOUBLE)
          ELSE round(((p % 180) + 180) % 180 - 90.0, 4)
          END AS start_lat,
        CASE WHEN no_latlng THEN CAST(NULL AS DOUBLE)
          ELSE round(((p * 2 % 360) + 360) % 360 - 180.0, 4)
          END AS start_lng,
        CASE WHEN no_latlng THEN CAST(NULL AS DOUBLE)
          ELSE round((((p + 1) % 180) + 180) % 180 - 90.0, 4)
          END AS end_lat,
        CASE WHEN no_latlng THEN CAST(NULL AS DOUBLE)
          ELSE round((((p * 2 + 1) % 360) + 360) % 360 - 180.0, 4)
          END AS end_lng,
        round((p + 7.0) / 100.0, 4) AS average_speed,
        round((p + 13.0) / 100.0, 4) AS max_speed,
        has_heartrate,
        CASE WHEN has_heartrate
          THEN CAST(id % 60 + 90 AS DOUBLE) ELSE NULL END
          AS average_heartrate,
        CASE WHEN has_heartrate
          THEN CAST(id % 60 + 120 AS DOUBLE) ELSE NULL END
          AS max_heartrate,
        false AS heartrate_opt_out,
        false AS display_hide_heartrate_option,
        round(((p % 500) + 500) % 500, 4) AS elev_high,
        round(((p % 100) + 100) % 100, 4) AS elev_low,
        id + 9000000 AS upload_id,
        CAST(id + 9000000 AS VARCHAR) AS upload_id_str,
        'ext_' || id AS external_id,
        false AS from_accepted_tag,
        CAST(id % 2 AS INTEGER) AS pr_count,
        CAST(id % 3 AS INTEGER) AS total_photo_count,
        false AS has_kudoed,
        CASE WHEN has_heartrate
          THEN CAST(id % 200 AS DOUBLE) ELSE NULL END
          AS suffer_score
      FROM raw"""))

  // ---------------------------------------------------------------------
  // E2: the Strava activities-snapshot entry point end to end
  // (get_activity_data.py:19-34, SURVEY §3 E2) — the remaining top-3
  // lifecycle after E1 (fitbit ingest) and E3 (streams build):
  //   year-range bounded scan (S3/S8, utils.py:33-79)
  //   → full 47-field normalization (P9/P10, utils.py:236-246)
  //   → date-stamped snapshot write + read-back (K2,
  //     get_activity_data.py:29-34)
  //   → per-(visibility, year) activity report over the SNAPSHOT.
  // Green means the whole chain — filter pushdown through the nested
  // projection, the parquet round trip of the nested athlete/map
  // structs, and the read-back aggregation — reproduces the relational
  // answer computed straight from the source table.
  // ---------------------------------------------------------------------
  val e2ActivitiesSnapshot = Q(
    "e2_activities_snapshot",
    (s, d) => {
      // dataset-keyed like the fixtures: two sessions running e2 against
      // different dataset dirs in one JVM must not wipe each other's
      // snapshot between write and read-back
      val out = freshDir(s"e2/${datasetKey(d)}/activities_2025-06-01.parquet")
      p9FullNested(s, d)
        .filter(substring(col("start_date_local"), 1, 4)
          .between("1995", "1997"))
        .withColumn("snapshot_date", lit("2025-06-01"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("visibility"),
          substring(col("start_date_local"), 1, 4).as("yr"))
        .agg(count(lit(1)).as("n_activities"),
          sum(col("distance").cast("decimal(18,2)")).cast("double")
            .as("total_distance"))
    },
    Some("""WITH raw AS (
        SELECT o_orderkey AS id,
          CASE WHEN o_orderkey % 5 = 0 THEN NULL
               ELSE o_orderstatus END AS visibility_raw,
          CASE WHEN o_orderkey % 3 = 0 THEN NULL
               ELSE o_totalprice END AS distance_raw,
          CAST(o_orderdate AS DATE) AS od
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 1997)
      SELECT coalesce(visibility_raw, 'everyone') AS visibility,
        strftime(od, '%Y') AS yr,
        count(*) AS n_activities,
        CAST(sum(CAST(coalesce(distance_raw, 0.0) AS DECIMAL(18,2)))
             AS DOUBLE) AS total_distance
      FROM raw GROUP BY 1, 2"""))

  // ---------------------------------------------------------------------
  // S5 + A1: file-listing catalog as a DataFrame — keys synthesized in
  // the reference's naming convention, date + id parsed back out with
  // regexp_extract, then argmax as a global top-1 via orderBy(..).limit(1),
  // which plans TakeOrderedAndProject: each partition keeps ONE candidate
  // row, only those cross the exchange, no sort of the full listing.
  // (max(struct(...)) is NOT equivalent in cost: struct buffers aren't
  // hash-aggregable, so it silently degrades to a full-input SortAggregate
  // — measured 6.3 s vs sub-second here at sf0.1, VERDICT r2.)
  // Ref: get_stream_data.py:56-62, utils.py:249-292.
  // ---------------------------------------------------------------------
  val s5CatalogArgmax = Q(
    "s5_catalog_argmax",
    (s, d) => {
      val listing = orders(s, d).select(
        concat(lit("lake/activities/all_activities_"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("_"),
          col("o_orderkey"), lit(".parquet")).as("key"))
      listing
        .select(col("key"),
          regexp_extract(col("key"),
            "all_activities_(\\d{4}-\\d{2}-\\d{2})_(\\d+)\\.parquet", 1)
            .as("fdate"),
          regexp_extract(col("key"),
            "all_activities_(\\d{4}-\\d{2}-\\d{2})_(\\d+)\\.parquet", 2)
            .cast("long").as("fid"))
        .orderBy(col("fdate").desc, col("fid").desc)
        .limit(1)
        .select(col("fdate").as("latest_date"),
          col("fid").as("latest_id"), col("key").as("latest_key"))
    },
    Some("""WITH listing AS (
        SELECT concat('lake/activities/all_activities_',
          strftime(o_orderdate, '%Y-%m-%d'), '_', o_orderkey,
          '.parquet') AS key FROM orders),
      parsed AS (
        SELECT key,
          regexp_extract(key,
            'all_activities_(\d{4}-\d{2}-\d{2})_(\d+)\.parquet', 1)
            AS fdate,
          CAST(regexp_extract(key,
            'all_activities_(\d{4}-\d{2}-\d{2})_(\d+)\.parquet', 2)
            AS BIGINT) AS fid
        FROM listing)
      SELECT fdate AS latest_date, fid AS latest_id, key AS latest_key
      FROM parsed ORDER BY fdate DESC, fid DESC LIMIT 1"""))

  // ---------------------------------------------------------------------
  // S6: the existence probe as a first-class operator — for every
  // candidate fetch key, a boolean "already materialized?" flag against
  // the store catalog (fitbit_utils.py:230-232 answers this per key with
  // a driver-side `in existing` list; get_stream_data routes on it,
  // utils.py:410-418). J2/J3/F4 consume the answer as routing; this
  // exposes the PROBE itself: left join on the parsed catalog id,
  // flag = match present. Distributed form: the candidate list is tiny
  // next to the catalog, the join is an equi-join on the id, and no
  // driver-side membership set ever exists.
  // ---------------------------------------------------------------------
  val s6ExistsProbe = Q(
    "s6_exists_probe",
    (s, d) => {
      val catalog = orders(s, d)
        .select(col("o_orderkey").as("fid")).distinct()
      // candidate worklist: some ids that exist (every 97th key) and
      // their successors, which mostly don't (TPC-H orderkeys are
      // sparse) — both flags must come back right
      val worklist = orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("cand_id"))
        .union(orders(s, d)
          .filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 1).as("cand_id")))
        .distinct()
      worklist.join(catalog, col("cand_id") === col("fid"), "left")
        .select(col("cand_id"), col("fid").isNotNull.as("exists_flag"))
    },
    Some("""WITH catalog AS (SELECT DISTINCT o_orderkey AS fid FROM orders),
      worklist AS (
        SELECT DISTINCT cand_id FROM (
          SELECT o_orderkey AS cand_id FROM orders WHERE o_orderkey % 97 = 0
          UNION ALL
          SELECT o_orderkey + 1 FROM orders WHERE o_orderkey % 97 = 0))
      SELECT w.cand_id, c.fid IS NOT NULL AS exists_flag
      FROM worklist w LEFT JOIN catalog c ON w.cand_id = c.fid"""))

  // ---------------------------------------------------------------------
  // F5 done right: exact-key membership via regexp parse + semi-join —
  // the reference's substring test (`str(id) in key`, utils.py:412) can
  // false-positive across ids sharing prefixes (§2.12.4); the intended
  // semantics is equality on the PARSED id, which is also the joinable
  // (and therefore distributable) form.
  // ---------------------------------------------------------------------
  val f5ExactKey = Q(
    "f5_exact_key",
    (s, d) => {
      // dedup on the 8-byte key BEFORE synthesizing the path string:
      // the distinct shuffle moves longs, not 40-byte strings (same
      // result; at 100 TB the string-distinct shuffle is 5× the bytes)
      val keys = lineitem(s, d)
        .select(col("l_orderkey")).distinct()
        .select(concat(lit("lake/streams/strava_stream_"),
          col("l_orderkey"), lit(".parquet")).as("key"))
        .withColumn("fid",
          regexp_extract(col("key"), "strava_stream_(\\d+)\\.parquet", 1)
            .cast("long"))
      val wanted = orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("id"))
      keys.join(wanted, col("fid") === col("id"), "left_semi")
        .select("key", "fid")
    },
    Some("""WITH keys AS (
        SELECT DISTINCT concat('lake/streams/strava_stream_', l_orderkey,
          '.parquet') AS key,
          CAST(regexp_extract(
            concat('lake/streams/strava_stream_', l_orderkey, '.parquet'),
            'strava_stream_(\d+)\.parquet', 1) AS BIGINT) AS fid
        FROM lineitem)
      SELECT key, fid FROM keys
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_orderkey % 10 = 0 AND o_orderkey = fid)"""))

  // ---------------------------------------------------------------------
  // K3: schema-ENFORCED write — the declared-StructType analogue of the
  // reference's `Table.from_pandas(df, schema=STREAM_SCHEMA)`
  // (utils.py:371-375): every column cast to its declared type before the
  // sink, sharded per key, read back. A record that can't cast fails the
  // job instead of silently widening the lake's schema.
  // ---------------------------------------------------------------------
  val k3SchemaWrite = Q(
    "k3_schema_write",
    (s, d) => {
      val out = freshDir("k3")
      lineitem(s, d)
        .select(
          col("l_orderkey").cast("long").as("activity_id"),
          col("l_linenumber").cast("long").as("time"),
          col("l_quantity").cast("double").as("distance"),
          col("l_extendedprice").cast("double").as("velocity_smooth"),
          (col("l_orderkey") % 10).cast("int").as("shard"))
        .repartition(col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      s.read.parquet(out)
    },
    Some("""SELECT l_orderkey AS activity_id,
      CAST(l_linenumber AS BIGINT) AS time,
      l_quantity AS distance, l_extendedprice AS velocity_smooth,
      CAST(l_orderkey % 10 AS INTEGER) AS shard FROM lineitem"""))

  // ---------------------------------------------------------------------
  // K6: small-files compaction — the lake maintenance operator the
  // reference's layout begs for: one file per (resource, day)
  // (services/fitbit/fitbit_utils.py:285-287, README's
  // intraday/{resource}/{resource}_{date}.parquet) is ~3k files/year per
  // athlete, and at 100 TB file-count explosion is the classic scan
  // killer (a footer open/seek per file, a linearly-growing file index
  // on the driver, undersized row groups defeating the vectorized
  // reader). The operator: list a fragmented dir, size the rewrite from
  // the observed row count (ceil(rows / ROWS_PER_FILE) — production
  // compactors plan from the listing exactly like this; the one
  // driver-side value is a scalar count, not a row materialization),
  // rewrite via repartitionByRange on the sort key so each output file
  // covers a contiguous key range (min/max footer stats stay selective
  // → range predicates still prune files after compaction), and report
  // the per-type content aggregate read back from the COMPACTED lake
  // plus before/after file counts. The oracle restates the aggregate
  // over the base table and both counts arithmetically — the row is
  // green iff compaction changed the file layout exactly as planned and
  // the content not at all. CompactionSpec additionally proves
  // row-identical content at two different file-count targets.
  // ---------------------------------------------------------------------
  private[graft] val K6_FRAG_FILES = 64
  private[graft] val K6_ROWS_PER_FILE = 4000L

  /** (file count, total bytes) of the part-files under a lake dir. */
  private[graft] def parquetFileStats(dir: String): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val stream = Files.walk(Paths.get(dir))
    try {
      val parts = stream.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toVector
      (parts.size.toLong, parts.map(Files.size).sum)
    } finally stream.close()
  }

  /** Fragmented-lake fixture: the events table shattered into
    * K6_FRAG_FILES round-robin files (memoized — building the mess is
    * scaffolding; the OPERATOR under measurement is the compaction). */
  private[graft] def k6FragFixture(s: SparkSession, d: String): String =
    memoFixture("k6_frag", d) { out =>
      events(s, d).repartition(K6_FRAG_FILES)
        .write.mode("overwrite").parquet(out)
    }

  /** Compact a fragmented events-shaped dir into ceil(rows/rowsPerFile)
    * range-partitioned files; returns the output dir. */
  private[graft] def compactEvents(
      s: SparkSession, fragDir: String, outDir: String,
      rowsPerFile: Long): String = {
    val frag = s.read.parquet(fragDir)
    val rows = frag.count()
    val nOut = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    frag.repartitionByRange(nOut, col("event_id"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  val k6Compaction = Q(
    "k6_compaction",
    (s, d) => {
      val frag = k6FragFixture(s, d)
      val (nBefore, _) = parquetFileStats(frag)
      val out = compactEvents(s, frag, freshDir("k6_compact"),
        K6_ROWS_PER_FILE)
      val (nAfter, _) = parquetFileStats(out)
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_files_before", lit(nBefore))
        .withColumn("n_files_after", lit(nAfter))
    },
    // n_files_before: round-robin repartition(64) writes one file per
    // NON-EMPTY partition, so a fixture smaller than 64 rows yields
    // `rows` files, not 64 — least() keeps the oracle honest at tiny
    // scale factors (r12 advice). n_files_after keeps the arithmetic
    // ceil(rows/4000): at any sf where rows<4000, nOut=1 (no empty-range
    // risk), and at the pinned sf each 4000-row range is dense.
    Some(s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      CAST(least((SELECT count(*) FROM events), $K6_FRAG_FILES)
        AS BIGINT) AS n_files_before,
      CAST(ceil(CAST((SELECT count(*) FROM events) AS DOUBLE)
        / $K6_ROWS_PER_FILE) AS BIGINT) AS n_files_after
      FROM events GROUP BY event_type"""))

  // ---------------------------------------------------------------------
  // K7: date-partition retention sweep — the second lake-maintenance
  // operator beside k6's compaction: write the events table partitioned
  // by event date, then DELETE every partition older than the retention
  // window and report the surviving lake (per-date counts + how many
  // partitions the sweep removed). The cutoff derives from the LAKE'S
  // OWN max date (never wall clock — replayable, oracle-checkable, and
  // how a backfill-safe retention job should anchor anyway: retention
  // relative to the newest data, not to when the job happens to run).
  // The delete is a per-partition-DIRECTORY drop — the O(partitions)
  // metadata operation retention is at any scale; no data file is ever
  // read, rewritten, or scanned (at 100 TB this is the same shape
  // against a table manifest/catalog instead of a directory listing).
  // ---------------------------------------------------------------------
  private[graft] val K7_RETENTION_DAYS = 7

  /** k7's imperative half, factored so the DSL query and its SQL twin
    * run ONE sweep definition: build the date-partitioned lake under
    * `sub`, drop every partition at or past the retention cutoff
    * (anchored to the lake's own max date), return (dir,
    * n_partitions_before, n_partitions_deleted). */
  private[graft] def k7Sweep(
      s: SparkSession, d: String, sub: String): (String, Long, Long) = {
    val dir = freshDir(sub)
    events(s, d).withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("event_date="))
      .map(p => p.getPath ->
        java.time.LocalDate.parse(
          p.getPath.getName.stripPrefix("event_date=")))
    val cutoff = parts.map(_._2).max(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      .minusDays(K7_RETENTION_DAYS)
    val dropped = parts.filter { case (_, dt) => !dt.isAfter(cutoff) }
    dropped.foreach { case (p, _) => fs.delete(p, true) }
    (dir, parts.length.toLong, dropped.length.toLong)
  }

  val k7Retention = Q(
    "k7_retention",
    (s, d) => {
      val (dir, nBefore, nDeleted) = k7Sweep(s, d, "k7_lake")
      s.read.parquet(dir)
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_partitions_before", lit(nBefore))
        .withColumn("n_partitions_deleted", lit(nDeleted))
    },
    Some(s"""WITH d AS (
        SELECT CAST(ts AS DATE) AS event_date, value FROM events),
      mx AS (SELECT max(event_date) AS m FROM d),
      kept AS (
        SELECT d.event_date, d.value FROM d, mx
        WHERE d.event_date > m - INTERVAL $K7_RETENTION_DAYS DAY)
      SELECT event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM d)
          AS n_partitions_before,
        (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM d) -
        (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM kept)
          AS n_partitions_deleted
      FROM kept GROUP BY event_date"""))

  // ---------------------------------------------------------------------
  // K9: dynamic partition overwrite — the corrected-day re-ingest, third
  // lake-maintenance operator beside k6 (compaction) and k7 (retention).
  // A prior run landed corrupted values in a trailing window of date
  // partitions; the repair recomputes ONLY that window and writes it
  // with partitionOverwriteMode=dynamic, which replaces exactly the
  // partitions present in the written data. That is the reprocessing
  // shape at 100 TB: cost O(affected days), never a full-table rewrite,
  // and concurrent readers of untouched partitions see stable files.
  // The proof is physical, not just relational: per-partition part-file
  // sets are listed before and after the repair, and the result reports
  // how many partitions kept their EXACT files (new writes get fresh
  // task UUIDs, so a clobbered partition cannot alias a preserved one).
  // Under static overwrite the same write would have deleted every
  // pre-repair partition — both the per-date counts and the preserved
  // count would go red, so the green row pins the dynamic semantics.
  // ---------------------------------------------------------------------
  private[graft] val K9_REPAIR_FROM = "2024-01-25"
  /** k9's imperative half, factored so the DSL query and its SQL twin
    * run ONE repair definition: seed the corrupted lake under `sub`,
    * dynamic-overwrite the repair window, return (dir,
    * n_partitions_preserved, n_partitions_overwritten) from the
    * physical before/after part-file sets. */
  private[graft] def k9Repair(
      s: SparkSession, d: String, sub: String): (String, Long, Long) = {
    val dir = freshDir(sub)
    val src = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_date(col("ts")).as("event_date"))
    // seed: the "bad run" negated every value in the repair window
    src.withColumn("value",
        when(col("event_date") >= lit(K9_REPAIR_FROM), -col("value"))
          .otherwise(col("value")))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    def fileSets(): Map[String, Set[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("event_date="))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath).map(_.getPath.getName)
            .filter(_.startsWith("part-")).toSet)
        .toMap
    val before = fileSets()
    // repair: recompute only the affected window; dynamic mode leaves
    // every partition absent from this write untouched on disk
    src.filter(col("event_date") >= lit(K9_REPAIR_FROM))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(dir)
    val after = fileSets()
    val preserved = before.count {
      case (p, files) => after.get(p).contains(files)
    }
    (dir, preserved.toLong, (before.size - preserved).toLong)
  }

  val k9PartitionOverwrite = Q(
    "k9_partition_overwrite",
    (s, d) => {
      val (dir, preserved, replaced) = k9Repair(s, d, "k9_lake")
      s.read.parquet(dir)
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_partitions_preserved", lit(preserved))
        .withColumn("n_partitions_overwritten", lit(replaced))
    },
    // the oracle replays the FINAL lake from the clean source: every
    // date's sum at its un-negated value (red if the repair missed a
    // window partition OR clobbered one outside it), preserved/replaced
    // derived from the same date split the repair used
    Some(s"""WITH d AS (
        SELECT CAST(ts AS DATE) AS event_date, value FROM events)
      SELECT event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM d
         WHERE event_date < DATE '$K9_REPAIR_FROM')
          AS n_partitions_preserved,
        (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM d
         WHERE event_date >= DATE '$K9_REPAIR_FROM')
          AS n_partitions_overwritten
      FROM d GROUP BY event_date"""))

  // The k10/k12 batch-window bounds (k10's WAP audit and k12's
  // time-travel publishes split the same source on them; both oracles
  // interpolate them eagerly at object init, so they live above both).
  private[graft] val K10_B1_FROM = "2024-01-21"
  private[graft] val K10_B2_FROM = "2024-01-26"

  // ---------------------------------------------------------------------
  // K12: snapshot time travel + rollback — the missing half of k10's
  // WAP commit story (VERDICT r16 #3; Iceberg/Delta both ship it):
  // k10's `_CURRENT` pointer names the live snapshot set, but nothing
  // read AS OF an older publish or rolled a bad one back. Here the
  // lake additionally keeps `_HISTORY` (append-only, one line per
  // publish = that version's full snapshot list — the Iceberg
  // metadata-log shape reduced to its essence). Every version stays
  // readable AS OF its history line forever, because snapshot dirs are
  // immutable and a publish only ADDS a dir plus a history line; and
  // ROLLBACK is a pointer flip to a prior history line — zero data
  // files touched, which WindowsAndSinkSpec verifies physically (the
  // rolled-back snapshot's part files survive byte-identical; only
  // `_CURRENT` changes). The bad publish is the realistic kind: it
  // PASSES k10's null audit (so it lands and goes live) and is caught
  // only by a downstream signal (negative values) — exactly the moment
  // time travel exists for, because the bad data is already serving.
  //
  // Report: one row per readable cut — v0/v1/v2 AS OF their history
  // lines plus the post-rollback `current` — each with its aggregate
  // and its badness signal (n_neg): v2 vs v1 is the s10 snapshot-diff
  // discipline applied across VERSIONS, and current == v1 is the
  // rollback proof in the result itself. At 100 TB everything here is
  // metadata-sized: AS OF resolves one history line to a file list,
  // rollback rewrites one pointer file, and no data file is ever
  // copied or deleted.
  // ---------------------------------------------------------------------
  /** K12's publish-history / AS-OF / rollback PROTOCOL factored from
    * its report (r20, VERDICT r19 #5): three audited publishes with an
    * append-only `_HISTORY`, AS-OF resolution of any history line to
    * its immutable file list, the downstream bad-value signal, and the
    * pointer rollback. Returns (asOf(0..2), current, rolledBack); the
    * fs actions stay DSL by design, and the history/AS-OF REPORT over
    * the returned frames is pure relational — the DSL row in the
    * DataFrame API, `sql_k12_history` as one SQL text, one oracle. */
  private[graft] def k12Protocol(s: SparkSession, d: String,
      lakeName: String): (Seq[DataFrame], DataFrame, Boolean) = {
      val lake = freshDir(lakeName)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(lake), s.sparkContext.hadoopConfiguration)
      def write(name: String, text: String): Unit = {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$lake/$name"), true)
        out.write(text.getBytes("UTF-8")); out.close()
      }
      def read(name: String): String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$lake/$name"))
        val b = new Array[Byte](4096); val n = in.read(b); in.close()
        new String(b, 0, n, "UTF-8")
      }
      var history = Vector.empty[String]
      def publish(snaps: String): Unit = {
        history :+= snaps
        write("_CURRENT", snaps)
        write("_HISTORY", history.mkString("\n"))
      }
      val src = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("event_date"))
      def stage(snap: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$lake/$snap")
      // three publishes, each audited with k10's null audit. Batch 2
      // negates values (event_id % 11) but nulls nothing, so the null
      // audit passes and the bad batch goes LIVE — the time-travel
      // scenario, not the WAP one.
      stage("snap-base",
        src.filter(col("event_date") < lit(K10_B1_FROM)))
      publish("snap-base")
      stage("snap-001",
        src.filter(col("event_date") >= lit(K10_B1_FROM) &&
          col("event_date") < lit(K10_B2_FROM)))
      publish("snap-base,snap-001")
      stage("snap-002",
        src.filter(col("event_date") >= lit(K10_B2_FROM))
          .withColumn("value",
            when(col("event_id") % 11 === 0, -col("value"))
              .otherwise(col("value"))))
      publish("snap-base,snap-001,snap-002")
      // AS OF: any history line resolves to its immutable file list
      def asOf(version: Int): DataFrame =
        read("_HISTORY").split("\n")(version).split(",")
          .map(p => s.read.parquet(s"$lake/$p"))
          .reduce(_ unionByName _)
      // the downstream signal fires on the LIVE table → roll back by
      // flipping the pointer to the prior history line; snap-002's
      // files and its history line both survive (re-publishable after
      // repair, auditable forever)
      val bad = asOf(2).filter(col("value") < 0).limit(1).count() > 0
      if (bad) write("_CURRENT", read("_HISTORY").split("\n")(1))
      val current = read("_CURRENT").split(",")
        .map(p => s.read.parquet(s"$lake/$p"))
        .reduce(_ unionByName _)
      ((0 to 2).map(asOf), current, bad)
  }

  val k12TimeTravel = Q(
    "k12_time_travel",
    (s, d) => {
      val (versions, current, bad) = k12Protocol(s, d, "k12_lake")
      def cut(version: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"),
            count(when(col("value") < 0, 1)).as("n_neg"))
          .select(lit(version).as("version"), col("n"),
            col("sum_value"), col("n_neg"))
      cut("v0", versions(0))
        .unionByName(cut("v1", versions(1)))
        .unionByName(cut("v2", versions(2)))
        .unionByName(cut("current", current))
        .withColumn("rolled_back", lit(bad))
    },
    // the oracle replays every cut from the source windows (re-poisons
    // batch 2 exactly as staged) and derives the rollback decision from
    // the same downstream predicate — current = v1 iff v2 holds a
    // negative value, else v2 (k10's nothing-hardcoded discipline)
    Some(s"""WITH d AS (
        SELECT event_id, value, CAST(ts AS DATE) AS event_date
        FROM events),
      base AS (SELECT value FROM d
               WHERE event_date < DATE '$K10_B1_FROM'),
      b1 AS (SELECT value FROM d
             WHERE event_date >= DATE '$K10_B1_FROM'
               AND event_date < DATE '$K10_B2_FROM'),
      b2p AS (
        SELECT CASE WHEN event_id % 11 = 0 THEN -value ELSE value END
          AS value
        FROM d WHERE event_date >= DATE '$K10_B2_FROM'),
      v1 AS (SELECT value FROM base UNION ALL SELECT value FROM b1),
      v2 AS (SELECT value FROM v1 UNION ALL SELECT value FROM b2p),
      bad AS (SELECT count(CASE WHEN value < 0 THEN 1 END) > 0 AS b
              FROM v2),
      cur AS (
        SELECT value FROM v1 WHERE (SELECT b FROM bad)
        UNION ALL
        SELECT value FROM v2 WHERE NOT (SELECT b FROM bad)),
      cuts AS (
        SELECT 'v0' AS version, * FROM base
        UNION ALL SELECT 'v1', * FROM v1
        UNION ALL SELECT 'v2', * FROM v2
        UNION ALL SELECT 'current', * FROM cur)
      SELECT version, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_neg,
        (SELECT b FROM bad) AS rolled_back
      FROM cuts GROUP BY version"""))

  // ---------------------------------------------------------------------
  // K15: VACUUM — the janitor the commit family still lacked (k10
  // publishes via the `_CURRENT` pointer, k12 travels/rolls back, but
  // nothing ever RECLAIMED the files a failed or rolled-back publish
  // left behind — Delta/Iceberg both ship this as VACUUM / expire +
  // remove-orphans). Replays k10's protocol (base published, batch 1
  // audits clean and publishes, batch 2 is poisoned: staged on disk
  // but NEVER published), then vacuums: snapshot dirs on disk are
  // diffed against the pointer's live set, orphans are counted and
  // deleted, and the published read re-runs over the vacuumed lake —
  // a green row proves the janitor deleted ONLY garbage (the pointer's
  // data is bit-intact) while the spec proves the orphan is physically
  // gone. Accounting stays replayable: orphan-ROW count and the
  // live/vacuumed snapshot counts derive from the audit flags (file
  // counts would be committer-dependent). At 100 TB this is the weekly
  // storage-reclaim job: cost = one listing diff (metadata-sized) +
  // O(orphan files) deletes, never a read of live data.
  // ---------------------------------------------------------------------
  val k15Vacuum = Q(
    "k15_vacuum",
    (s, d) => {
      val lake = freshDir("k15_lake")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(lake), s.sparkContext.hadoopConfiguration)
      def setPointer(snap: String): Unit = {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$lake/_CURRENT"), true)
        out.write(snap.getBytes("UTF-8")); out.close()
      }
      def getPointer: String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$lake/_CURRENT"))
        val b = new Array[Byte](256); val n = in.read(b); in.close()
        new String(b, 0, n, "UTF-8")
      }
      val src = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("event_date"))
      def stage(snap: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$lake/$snap")
      def audit(snap: String): Boolean = {
        val r = s.read.parquet(s"$lake/$snap")
          .agg(count(lit(1)),
            count(when(col("event_id").isNull ||
              col("event_type").isNull, 1)),
            count(when(col("value") < 0, 1))).head()
        r.getLong(0) > 0 && r.getLong(1) == 0 && r.getLong(2) == 0
      }
      stage("snap-base", src.filter(col("event_date") < lit(K10_B1_FROM)))
      setPointer("snap-base")
      stage("snap-001", src.filter(col("event_date") >= lit(K10_B1_FROM)
        && col("event_date") < lit(K10_B2_FROM)))
      if (audit("snap-001")) setPointer(getPointer + ",snap-001")
      // batch 2: k10's poisoned window — staged, audit fails, never
      // published; its files are the orphans VACUUM exists for
      stage("snap-002", src.filter(col("event_date") >= lit(K10_B2_FROM))
        .withColumn("event_type",
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")))
        .withColumn("value",
          when(col("event_id") % 11 === 0, -col("value"))
            .otherwise(col("value"))))
      if (audit("snap-002")) setPointer(getPointer + ",snap-002")
      // the orphan-row accounting reads the doomed snapshot BEFORE the
      // delete (replayable: the oracle re-derives it from the same
      // poisoning + audit predicates)
      val live = getPointer.split(",").toSet
      val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(lake))
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("snap-"))
        .map(_.getPath.getName).toSet
      val orphans = (onDisk -- live).toSeq.sorted
      val rowsVacuumed = orphans.map(o =>
        s.read.parquet(s"$lake/$o").count()).sum
      orphans.foreach(o => fs.delete(
        new org.apache.hadoop.fs.Path(s"$lake/$o"), true))
      // the published read over the VACUUMED lake — identical to k10's
      // pre-vacuum read iff the janitor deleted only garbage
      val read = getPointer.split(",")
        .map(p => s.read.parquet(s"$lake/$p"))
        .reduce(_ unionByName _)
      read.groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_snapshots_live", lit(live.size.toLong))
        .withColumn("n_snapshots_vacuumed", lit(orphans.size.toLong))
        .withColumn("rows_vacuumed", lit(rowsVacuumed))
    },
    // the oracle replays k10's publish protocol (poison + audit
    // predicates, nothing hardcoded) to derive the live set, then the
    // vacuumed-orphan accounting is the complement: rows of every
    // staged-but-unpublished batch
    Some(s"""WITH d AS (
        SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
        FROM events),
      b1 AS (SELECT * FROM d
             WHERE event_date >= DATE '$K10_B1_FROM'
               AND event_date < DATE '$K10_B2_FROM'),
      b2p AS (
        SELECT event_id,
          CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
            AS event_type,
          CASE WHEN event_id % 11 = 0 THEN -value ELSE value END AS value,
          event_date
        FROM d WHERE event_date >= DATE '$K10_B2_FROM'),
      flags AS (
        SELECT
          (SELECT count(*) > 0
              AND count(CASE WHEN event_id IS NULL
                OR event_type IS NULL THEN 1 END) = 0
              AND count(CASE WHEN value < 0 THEN 1 END) = 0
            FROM b1) AS b1ok,
          (SELECT count(*) > 0
              AND count(CASE WHEN event_id IS NULL
                OR event_type IS NULL THEN 1 END) = 0
              AND count(CASE WHEN value < 0 THEN 1 END) = 0
            FROM b2p) AS b2ok),
      pub AS (
        SELECT value, event_date FROM d
        WHERE event_date < DATE '$K10_B1_FROM'
        UNION ALL
        SELECT value, event_date FROM b1 WHERE (SELECT b1ok FROM flags)
        UNION ALL
        SELECT value, event_date FROM b2p WHERE (SELECT b2ok FROM flags)),
      acct AS (
        SELECT
          CAST(1 + (CASE WHEN b1ok THEN 1 ELSE 0 END)
             + (CASE WHEN b2ok THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
          CAST((CASE WHEN b1ok THEN 0 ELSE 1 END)
             + (CASE WHEN b2ok THEN 0 ELSE 1 END) AS BIGINT) AS n_vac,
          CAST((CASE WHEN b1ok THEN 0
              ELSE (SELECT count(*) FROM b1) END)
            + (CASE WHEN b2ok THEN 0
              ELSE (SELECT count(*) FROM b2p) END) AS BIGINT) AS rows_vac
        FROM flags)
      SELECT event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        (SELECT n_live FROM acct) AS n_snapshots_live,
        (SELECT n_vac FROM acct) AS n_snapshots_vacuumed,
        (SELECT rows_vac FROM acct) AS rows_vacuumed
      FROM pub GROUP BY event_date"""))

  // ---------------------------------------------------------------------
  // K16: EXPIRE SNAPSHOTS — the retention half of the janitor pair
  // (k15 reclaims staged-but-never-published orphans; THIS retires
  // formerly-LIVE versions per policy — Iceberg's expire_snapshots /
  // Delta's log retention): `_HISTORY` keeps every publish readable
  // forever (k12), which at 100 TB means unbounded metadata AND
  // unbounded storage pinned by old version lines. Expiry keeps the
  // last K16_RETAIN history lines (plus whatever `_CURRENT` names),
  // trims `_HISTORY` to them, and deletes exactly the snapshot dirs no
  // SURVIVING line references. The load-bearing subtlety this scenario
  // exercises: a dir introduced by an EXPIRED line but still referenced
  // by a surviving one (snap-base, carried forward across publishes)
  // MUST survive — reference-counting by introducing-version instead of
  // by surviving-line reachability is the classic expire bug that eats
  // live data. The protocol plants both cases in one run: a partial
  // compaction rewrites only snap-001 into snap-compact01, so after
  // RETAIN=2 of four versions, snap-001 is reclaimed (referenced only
  // by expired lines) while snap-base survives (shared with retained
  // lines); the current read re-runs over the expired lake and its
  // accounting columns prove live data is untouched. At 100 TB: one
  // history-file rewrite + a set-difference over dir names + O(expired
  // files) deletes — metadata-sized except the unavoidable deletes.
  // ---------------------------------------------------------------------
  private[graft] val K16_RETAIN = 2

  val k16ExpireSnapshots = Q(
    "k16_expire_snapshots",
    (s, d) => {
      val lake = freshDir("k16_lake")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(lake), s.sparkContext.hadoopConfiguration)
      def write(name: String, text: String): Unit = {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$lake/$name"), true)
        out.write(text.getBytes("UTF-8")); out.close()
      }
      def read(name: String): String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$lake/$name"))
        val b = new Array[Byte](4096); val n = in.read(b); in.close()
        new String(b, 0, n, "UTF-8")
      }
      var history = Vector.empty[String]
      def publish(snaps: String): Unit = {
        history :+= snaps
        write("_CURRENT", snaps)
        write("_HISTORY", history.mkString("\n"))
      }
      val src = events(s, d)
        .select(col("event_id"), col("value"),
          to_date(col("ts")).as("event_date"))
      def stage(snap: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$lake/$snap")
      // v0: base; v1: base+001; v2: base+compact01 (001 REWRITTEN into
      // a new dir, base carried forward as-is — partial compaction);
      // v3: base+compact01+002
      stage("snap-base",
        src.filter(col("event_date") < lit(K10_B1_FROM)))
      publish("snap-base")
      val w1 = src.filter(col("event_date") >= lit(K10_B1_FROM) &&
        col("event_date") < lit(K10_B2_FROM))
      stage("snap-001", w1)
      publish("snap-base,snap-001")
      stage("snap-compact01", s.read.parquet(s"$lake/snap-001"))
      publish("snap-base,snap-compact01")
      stage("snap-002",
        src.filter(col("event_date") >= lit(K10_B2_FROM)))
      publish("snap-base,snap-compact01,snap-002")
      // expire: retain the last K16_RETAIN lines ∪ the current line
      val all = read("_HISTORY").split("\n").toVector
      val retained = (all.takeRight(K16_RETAIN) :+ read("_CURRENT"))
        .distinct
      val expired = all.filterNot(retained.contains)
      val referenced = retained.flatMap(_.split(",")).toSet
      val expiredRefs = expired.flatMap(_.split(",")).toSet
      val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(lake))
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("snap-"))
        .map(_.getPath.getName).toSet
      val doomed = (onDisk -- referenced).toSeq.sorted
      doomed.foreach(p => fs.delete(
        new org.apache.hadoop.fs.Path(s"$lake/$p"), true))
      write("_HISTORY", retained.mkString("\n"))
      // the current read over the EXPIRED lake — identical to the
      // pre-expiry read iff only unreachable dirs died
      val cur = read("_CURRENT").split(",")
        .map(p => s.read.parquet(s"$lake/$p"))
        .reduce(_ unionByName _)
        .agg(count(lit(1)).as("current_n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("current_sum"))
      val dirs = Seq("snap-base", "snap-001", "snap-compact01",
        "snap-002")
      val perDir = dirs.map { p =>
        val n =
          if (doomed.contains(p)) -1L // reclaimed: rows gone by design
          else s.read.parquet(s"$lake/$p").count()
        (p, n, expiredRefs.contains(p), referenced.contains(p),
          doomed.contains(p))
      }
      import s.implicits._
      perDir
        .toDF("snapshot", "n_rows", "in_expired_line",
          "in_retained_line", "reclaimed")
        .crossJoin(broadcast(cur))
        .withColumn("versions_before", lit(all.size.toLong))
        .withColumn("versions_after", lit(retained.size.toLong))
    },
    // the oracle replays the four publish lines' reachability algebra
    // and derives every row count from the same source windows — the
    // reclaimed dir reports -1 (its rows are gone BY DESIGN; the
    // surviving copy of that data is snap-compact01's count)
    Some(s"""WITH d AS (
        SELECT event_id, value, CAST(ts AS DATE) AS event_date
        FROM events),
      base AS (SELECT * FROM d WHERE event_date < DATE '$K10_B1_FROM'),
      w1 AS (SELECT * FROM d
             WHERE event_date >= DATE '$K10_B1_FROM'
               AND event_date < DATE '$K10_B2_FROM'),
      w2 AS (SELECT * FROM d WHERE event_date >= DATE '$K10_B2_FROM'),
      cur AS (
        SELECT CAST(count(*) AS BIGINT) AS current_n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            AS current_sum
        FROM d),
      dirs AS (
        SELECT 'snap-base' AS snapshot,
          (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_rows,
          true AS in_expired_line, true AS in_retained_line,
          false AS reclaimed
        UNION ALL
        SELECT 'snap-001', CAST(-1 AS BIGINT), true, false, true
        UNION ALL
        SELECT 'snap-compact01',
          (SELECT CAST(count(*) AS BIGINT) FROM w1), false, true, false
        UNION ALL
        SELECT 'snap-002',
          (SELECT CAST(count(*) AS BIGINT) FROM w2), false, true, false)
      SELECT snapshot, n_rows, in_expired_line, in_retained_line,
        reclaimed, cur.current_n, cur.current_sum,
        CAST(4 AS BIGINT) AS versions_before,
        CAST(2 AS BIGINT) AS versions_after
      FROM dirs CROSS JOIN cur"""))

  // ---------------------------------------------------------------------
  // K17: partition-spec evolution — the lake grows out of its layout
  // without rewriting history (Iceberg's headline trick, reduced to
  // its essence): the standing lake is day-partitioned; from the
  // evolution point on, NEW batches land month-partitioned (the date
  // column retained as data — the partition column is derived, so no
  // information is lost), and old files are NEVER touched. The price
  // is honest and REPORTED: a day-predicate read prunes the old layout
  // to exactly its day directory but the new layout only to the whole
  // month — rows_scanned vs probe_rows per layout is the coarseness
  // cost a planner pays until the next natural rewrite (k6 compaction
  // is the mechanism that would eventually converge layouts). All
  // accounting is data-derived (partition counts from the data's own
  // distinct dates/months, scan rows from the pruned reads), so the
  // oracle replays every number from the source windows. At 100 TB:
  // evolution is a metadata decision — zero data movement, O(new
  // batch) writes only.
  // ---------------------------------------------------------------------
  val k17PartitionEvolution = Q(
    "k17_partition_evolution",
    (s, d) => {
      val lake = freshDir("k17_lake")
      val src = events(s, d)
        .select(col("event_id"), col("value"),
          to_date(col("ts")).as("event_date"))
      // standing day-partitioned generation
      src.filter(col("event_date") < lit(K10_B2_FROM))
        .repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(s"$lake/day")
      // evolved month-partitioned generation: the partition column is
      // DERIVED, the date column stays in the data files
      src.filter(col("event_date") >= lit(K10_B2_FROM))
        .withColumn("event_month",
          date_format(col("event_date"), "yyyy-MM"))
        .repartition(col("event_month"))
        .write.mode("overwrite").partitionBy("event_month")
        .parquet(s"$lake/month")
      val dayLake = s.read.parquet(s"$lake/day")
      val monthLake = s.read.parquet(s"$lake/month")
      val probeDay = K10_B1_FROM // lives in the day layout
      val probeDay2 = K10_B2_FROM // lives in the month layout
      def report(layout: String, probe: String, nParts: DataFrame,
          nRows: DataFrame, scanned: DataFrame, probeRows: DataFrame)
          : DataFrame =
        nParts.crossJoin(nRows).crossJoin(scanned).crossJoin(probeRows)
          .select(lit(layout).as("layout"),
            col("n_partitions"), col("n_rows"),
            lit(probe).as("probe_date"),
            col("rows_scanned"), col("probe_rows"))
      val day = report("day", probeDay,
        dayLake.agg(countDistinct(col("event_date"))
          .as("n_partitions")),
        dayLake.agg(count(lit(1)).as("n_rows")),
        // the day predicate prunes to exactly its directory
        dayLake.filter(col("event_date") === lit(probeDay))
          .agg(count(lit(1)).as("rows_scanned")),
        dayLake.filter(col("event_date") === lit(probeDay))
          .agg(count(lit(1)).as("probe_rows")))
      val month = report("month", probeDay2,
        monthLake.agg(countDistinct(col("event_month"))
          .as("n_partitions")),
        monthLake.agg(count(lit(1)).as("n_rows")),
        // the day predicate can only prune to the MONTH — the whole
        // month directory scans for one day's rows
        monthLake.filter(col("event_month") ===
            lit(probeDay2.substring(0, 7)))
          .agg(count(lit(1)).as("rows_scanned")),
        monthLake.filter(col("event_date") === lit(probeDay2))
          .agg(count(lit(1)).as("probe_rows")))
      day.unionAll(month)
    },
    Some(s"""WITH d AS (
        SELECT event_id, value, CAST(ts AS DATE) AS event_date
        FROM events),
      dayw AS (SELECT * FROM d WHERE event_date < DATE '$K10_B2_FROM'),
      monw AS (SELECT * FROM d WHERE event_date >= DATE '$K10_B2_FROM')
      SELECT 'day' AS layout,
        CAST(count(DISTINCT event_date) AS BIGINT) AS n_partitions,
        CAST(count(*) AS BIGINT) AS n_rows,
        '$K10_B1_FROM' AS probe_date,
        CAST(count(CASE WHEN event_date = DATE '$K10_B1_FROM'
          THEN 1 END) AS BIGINT) AS rows_scanned,
        CAST(count(CASE WHEN event_date = DATE '$K10_B1_FROM'
          THEN 1 END) AS BIGINT) AS probe_rows
      FROM dayw
      UNION ALL
      SELECT 'month',
        CAST(count(DISTINCT strftime(event_date, '%Y-%m')) AS BIGINT),
        CAST(count(*) AS BIGINT),
        '$K10_B2_FROM',
        CAST(count(CASE WHEN strftime(event_date, '%Y-%m') =
          substring('$K10_B2_FROM', 1, 7) THEN 1 END) AS BIGINT),
        CAST(count(CASE WHEN event_date = DATE '$K10_B2_FROM'
          THEN 1 END) AS BIGINT)
      FROM monw"""))

  // ---------------------------------------------------------------------
  // K13: MERGE upsert — the lakehouse primitive that completes the
  // commit family (k9 repairs, k10 publishes, k11 erases, k12 travels,
  // THIS upserts; Iceberg/Delta ship it as MERGE INTO): an arriving
  // batch of UPDATES (matched keys with refreshed values) and INSERTS
  // (new keys, half landing in a brand-new date partition) merges into
  // the partitioned lake by rewriting ONLY the partitions the batch
  // touches — survivors of affected partitions rewrite with updates
  // applied, inserts append into their (possibly new) partitions via
  // the same dynamic overwrite, untouched partitions stay byte-
  // identical on disk (k11's mechanism). Accounting is k13's ONE
  // metadata-sized aggregate over the batch (update/insert counts per
  // date) plus the partition-name listing; the report carries the full
  // blast radius (rows updated/inserted, partitions rewritten/created/
  // preserved). The oracle replays the merged lake from the source and
  // derives every accounting column from the same predicates. At
  // 100 TB this is the hourly CDC-apply job: cost scales with the
  // batch's partition footprint, never table size.
  // ---------------------------------------------------------------------
  private[graft] val K13_UPD_MOD = 503L
  private[graft] val K13_INS_MOD = 701L
  private[graft] val K13_INS_OFFSET = 100000000L

  /** K13's MERGE protocol factored from its report (r20, VERDICT r19
    * #5): seed the partitioned lake, derive the update/insert batch,
    * run the ONE metadata-sized accounting pass that names the blast
    * radius, and dynamic-overwrite only the affected partitions.
    * Returns the merged lake dir plus the accounting scalars
    * (n_updated, n_inserted, parts rewritten/created/preserved); the
    * read-back report over the merged lake is pure relational — DSL
    * row below, `sql_k13_merge` as one SQL text, one oracle. */
  private[graft] def k13Protocol(s: SparkSession, d: String,
      lakeName: String): (String, Long, Long, Long, Long, Long) = {
      val dir = freshDir(lakeName)
      val src = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("event_date"))
      src.repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
      val existing = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("event_date="))
        .map(_.getPath.getName.stripPrefix("event_date=")).toSet
      // the arriving batch: updates keep their key and date, inserts
      // take offset keys and half land 40 days out (a new partition)
      val updates = src.filter(col("event_id") % K13_UPD_MOD === 0)
        .withColumn("value", col("value") + lit(1000.0))
      val inserts = src.filter(col("event_id") % K13_INS_MOD === 0)
        .select((col("event_id") + K13_INS_OFFSET).as("event_id"),
          col("event_type"),
          (col("value") + lit(5.0)).as("value"),
          when(col("event_id") % (2 * K13_INS_MOD) === 0,
            date_add(col("event_date"), 40))
            .otherwise(col("event_date")).as("event_date"))
      val batch = updates.unionByName(inserts)
      // ONE metadata-sized accounting pass (the k11 r17 discipline):
      // per-date update/insert counts name the affected partitions
      val acct = batch.groupBy(col("event_date"))
        .agg(count(when(col("event_id") < K13_INS_OFFSET, 1))
            .as("n_upd"),
          count(when(col("event_id") >= K13_INS_OFFSET, 1))
            .as("n_ins")).collect()
      val affected = acct.map(_.getDate(0).toString).toSet
      val nUpdated = acct.map(_.getLong(1)).sum
      val nInserted = acct.map(_.getLong(2)).sum
      val created = affected -- existing
      val rewritten = affected & existing
      val preserved = existing -- affected
      // the MERGE: affected partitions' survivors + applied updates +
      // inserts, dynamic overwrite (untouched partitions never written;
      // phases read from src, never the lake being overwritten — the
      // k9/k11 self-overlap rule)
      src
        .filter(col("event_date").cast("string")
          .isInCollection(affected) &&
          col("event_id") % K13_UPD_MOD =!= 0)
        .unionByName(batch)
        .repartition(col("event_date"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date").parquet(dir)
      (dir, nUpdated, nInserted, rewritten.size.toLong,
        created.size.toLong, preserved.size.toLong)
  }

  val k13MergeUpsert = Q(
    "k13_merge_upsert",
    (s, d) => {
      val (dir, nUpdated, nInserted, nRewritten, nCreated, nPreserved) =
        k13Protocol(s, d, "k13_lake")
      s.read.parquet(dir)
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_updated", lit(nUpdated))
        .withColumn("n_inserted", lit(nInserted))
        .withColumn("n_parts_rewritten", lit(nRewritten))
        .withColumn("n_parts_created", lit(nCreated))
        .withColumn("n_parts_preserved", lit(nPreserved))
    },
    // the oracle replays the merged lake from the source — red if an
    // update was missed, an insert dropped or double-applied, or a
    // bystander clobbered — and derives every accounting column from
    // the same predicates
    Some(s"""WITH d AS (
        SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
        FROM events),
      upd AS (
        SELECT event_id, value + 1000.0 AS value, event_date
        FROM d WHERE event_id % $K13_UPD_MOD = 0),
      ins AS (
        SELECT event_id + $K13_INS_OFFSET AS event_id,
          value + 5.0 AS value,
          CASE WHEN event_id % ${2 * K13_INS_MOD} = 0
            THEN event_date + 40 ELSE event_date END AS event_date
        FROM d WHERE event_id % $K13_INS_MOD = 0),
      final AS (
        SELECT value, event_date FROM d
        WHERE event_id % $K13_UPD_MOD <> 0
        UNION ALL SELECT value, event_date FROM upd
        UNION ALL SELECT value, event_date FROM ins),
      aff AS (SELECT DISTINCT event_date FROM (
          SELECT event_date FROM upd
          UNION ALL SELECT event_date FROM ins) u),
      ex AS (SELECT DISTINCT event_date FROM d),
      acct AS (SELECT
        (SELECT count(*) FROM upd) AS n_updated,
        (SELECT count(*) FROM ins) AS n_inserted,
        (SELECT count(*) FROM aff
          WHERE event_date IN (SELECT event_date FROM ex)) AS n_rw,
        (SELECT count(*) FROM aff
          WHERE event_date NOT IN (SELECT event_date FROM ex)) AS n_cr,
        (SELECT count(*) FROM ex
          WHERE event_date NOT IN (SELECT event_date FROM aff)) AS n_pr)
      SELECT event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        (SELECT CAST(n_updated AS BIGINT) FROM acct) AS n_updated,
        (SELECT CAST(n_inserted AS BIGINT) FROM acct) AS n_inserted,
        (SELECT CAST(n_rw AS BIGINT) FROM acct) AS n_parts_rewritten,
        (SELECT CAST(n_cr AS BIGINT) FROM acct) AS n_parts_created,
        (SELECT CAST(n_pr AS BIGINT) FROM acct) AS n_parts_preserved
      FROM final GROUP BY event_date"""))

  // ---------------------------------------------------------------------
  // K11: targeted delete — the GDPR/takedown pass every lake needs:
  // erase a keyed row set from a partitioned parquet table while
  // rewriting ONLY the partitions that contain a hit. Three-phase:
  // (1) the affected-partition list (one filtered scan, distinct
  // dates — partition METADATA, driver-held like k9's fs listings,
  // bounded by |partitions| never by rows); (2) a dynamic-mode
  // overwrite of survivors in exactly those partitions (untouched
  // partitions stay byte-identical on disk — the fs file sets prove
  // it); (3) the lakehouse gotcha handled EXPLICITLY: a partition
  // whose every row is deleted produces no output rows, so dynamic
  // overwrite never touches it and the stale files would survive — the
  // DATA decides which (affected dates with zero survivor rows, one
  // extra metadata-sized aggregate off the already-computed survivor
  // frame; ADVICE r16 #2: inferring "no rewrite happened" from
  // part-file NAME-set equality is safe only under UUID-named
  // committers — a deterministic committer would make a rewritten
  // partial partition look unchanged and get its survivors deleted),
  // with the fs diff kept as a cross-check ASSERTION that the
  // committer behaved. The
  // report carries the delete's full accounting (rows deleted,
  // partitions rewritten / dropped / preserved) — the d13 rule: a
  // compliance job's blast radius is queryable output, not a log line.
  // At 100 TB this is the nightly erasure job: cost scales with
  // affected partitions, never table size.
  // ---------------------------------------------------------------------
  private[graft] val K11_DEL_MOD = 2003L

  val k11TargetedDelete = Q(
    "k11_targeted_delete",
    (s, d) => {
      val dir = freshDir("k11_lake")
      val src = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), to_date(col("ts")).as("event_date"))
      src.repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
      def fileSets(): Map[String, Set[String]] =
        fs.listStatus(new org.apache.hadoop.fs.Path(dir))
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("event_date="))
          .map(st => st.getPath.getName ->
            fs.listStatus(st.getPath).map(_.getPath.getName)
              .filter(_.startsWith("part-")).toSet)
          .toMap
      val before = fileSets()
      val pred = col("event_id") % K11_DEL_MOD === 0
      // phase 1: ONE metadata-sized per-date accounting scan (bounded
      // by the partition count, the same driver scale as the fs
      // listings) yields the affected list, the deleted-row count, AND
      // the fully-deleted (zero-survivor) dates the rewrite cannot
      // touch — the r16 form ran two scans for the first two and
      // inferred the third from part-file name equality, which is only
      // safe under UUID-named committers (ADVICE r16 #2). Phases read
      // from `src`, never the lake path being overwritten (Spark
      // refuses a self-overlapping read/overwrite, and k9's repair
      // reads its source the same way).
      val acct = src.groupBy(col("event_date"))
        .agg(count(when(pred, 1)).as("n_del"),
          count(when(!pred, 1)).as("n_keep"))
        .filter(col("n_del") > 0).collect()
      val affected = acct.map(_.getDate(0).toString).toSet
      val nDeleted = acct.map(_.getLong(1)).sum
      val dropped =
        acct.filter(_.getLong(2) == 0L).map(_.getDate(0).toString).toSet
      // phase 2: survivors of affected partitions only, dynamic mode —
      // the write never touches an unaffected partition
      src
        .filter(col("event_date").cast("string")
          .isInCollection(affected) && !pred)
        .repartition(col("event_date"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date").parquet(dir)
      // phase 3: the zero-survivor dates keep their stale files
      // (dynamic overwrite only replaces written partitions) — drop
      // exactly the data-named set
      // fs diff as a cross-check only (ADVICE r16 #2): with Spark's
      // UUID-named committer an untouched dir keeps its exact file
      // set; a mismatch here means the committer wrote deterministic
      // names and the fs heuristic would have mis-detected
      val after = fileSets()
      val fsUnchanged = affected.filter { dt =>
        val p = s"event_date=$dt"
        before.get(p).exists(after.get(p).contains)
      }
      require(fsUnchanged == dropped,
        s"k11: fs-diff dropped-partition set $fsUnchanged disagrees " +
          s"with the data-derived set $dropped — committer naming " +
          "assumption violated")
      dropped.foreach(dt => fs.delete(
        new org.apache.hadoop.fs.Path(s"$dir/event_date=$dt"), true))
      val preserved = before.keys.count(p =>
        !affected.contains(p.stripPrefix("event_date=")))
      s.read.parquet(dir)
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("n_deleted", lit(nDeleted))
        .withColumn("n_partitions_rewritten",
          lit((affected.size - dropped.size).toLong))
        .withColumn("n_partitions_dropped", lit(dropped.size.toLong))
        .withColumn("n_partitions_preserved", lit(preserved.toLong))
    },
    // the oracle replays the final lake from the source (survivor rows
    // only — red if the delete missed a row, clobbered a bystander
    // partition, or left a fully-deleted partition's stale files) and
    // derives every accounting column from the same predicate
    Some(s"""WITH d AS (
        SELECT event_id, value, CAST(ts AS DATE) AS event_date
        FROM events),
      del AS (SELECT * FROM d WHERE event_id % $K11_DEL_MOD = 0),
      surv AS (SELECT * FROM d WHERE event_id % $K11_DEL_MOD <> 0),
      aff AS (SELECT DISTINCT event_date FROM del),
      stats AS (
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM del) AS n_deleted,
          (SELECT CAST(count(*) AS BIGINT) FROM aff a
           WHERE EXISTS (SELECT 1 FROM surv s
                         WHERE s.event_date = a.event_date))
            AS n_partitions_rewritten,
          (SELECT CAST(count(*) AS BIGINT) FROM aff a
           WHERE NOT EXISTS (SELECT 1 FROM surv s
                             WHERE s.event_date = a.event_date))
            AS n_partitions_dropped,
          (SELECT CAST(count(DISTINCT event_date) AS BIGINT) FROM d)
            - (SELECT CAST(count(*) AS BIGINT) FROM aff)
            AS n_partitions_preserved)
      SELECT s.event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(s.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        t.n_deleted, t.n_partitions_rewritten, t.n_partitions_dropped,
        t.n_partitions_preserved
      FROM surv s CROSS JOIN stats t
      GROUP BY s.event_date, t.n_deleted, t.n_partitions_rewritten,
        t.n_partitions_dropped, t.n_partitions_preserved"""))

  // ---------------------------------------------------------------------
  // K10: write-audit-publish — the Iceberg/Netflix WAP commit protocol
  // on a plain parquet lake: every batch lands in an UNPUBLISHED
  // staging snapshot, a relational audit runs against the staged files
  // (row floor, key-null count, value bounds), and only a passing batch
  // gets the pointer flip — a one-line `_CURRENT` file naming the live
  // snapshot, the atomic-publish primitive on object stores where
  // directory rename is not atomic. A failing batch stays quarantined
  // in staging WITH its violation counts (the d13 no-silent-dials rule:
  // "how bad was it" is queryable, not logged), and readers of
  // `_CURRENT` never observe a half-published or poisoned row.
  //
  // Scale shape: audits are one hash-agg scan of the STAGED BATCH only
  // (never the published table), publish is O(1) metadata, and the
  // published read is pointer → snapshot dir — so commit cost is
  // independent of table size, which is the whole point at 100 TB.
  // Snapshot 2 here simulates the upstream bug WAP exists to catch:
  // nulled keys (id%7) and negated values (id%11) in the final window.
  // ---------------------------------------------------------------------
  // (K10_B1_FROM / K10_B2_FROM are declared above k12, which also
  // splits its publishes on them — object-init order: k12's oracle
  // string interpolates them eagerly.)

  /** K10's write-audit-publish PROTOCOL factored from its report
    * (r20, VERDICT r19 #5 — the sql_k6/k7/k9 discipline): stage both
    * batches, audit each staged snapshot ON DISK, flip the `_CURRENT`
    * pointer only for clean audits, and hand back the published read
    * path (pointer → snapshot dirs, nothing else) plus the audit
    * verdicts. The fs actions stay DSL by design (like m2's decode);
    * the REPORT over the returned frame is pure relational — the DSL
    * row aggregates it with the DataFrame API, `sql_k10_audit` as one
    * SQL text, both sharing one oracle. */
  private[graft] def k10Protocol(s: SparkSession, d: String,
      lakeName: String): (DataFrame, Boolean, Boolean, Long, Long) = {
      val lake = freshDir(lakeName)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(lake), s.sparkContext.hadoopConfiguration)
      def setPointer(snap: String): Unit = {
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$lake/_CURRENT"), true)
        out.write(snap.getBytes("UTF-8")); out.close()
      }
      def getPointer: String = {
        val in = fs.open(
          new org.apache.hadoop.fs.Path(s"$lake/_CURRENT"))
        val b = new Array[Byte](256); val n = in.read(b); in.close()
        new String(b, 0, n, "UTF-8")
      }
      val src = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("event_date"))
      // audit the staged snapshot ON DISK (what was written, not what
      // we meant to write); returns (rows, null_viol, bound_viol)
      def audit(snap: String): (Long, Long, Long) = {
        val r = s.read.parquet(s"$lake/$snap")
          .agg(count(lit(1)),
            count(when(col("event_id").isNull ||
              col("event_type").isNull, 1)),
            count(when(col("value") < 0, 1))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      // write staged; publish = flip pointer to base+batch union view:
      // each snapshot dir holds ONLY its batch, `_CURRENT` lists the
      // live snapshot set (comma-joined, append-only on publish)
      def stage(snap: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$lake/$snap")
      stage("snap-base", src.filter(col("event_date") < lit(K10_B1_FROM)))
      setPointer("snap-base")
      // batch 1: clean window [B1, B2) — audits pass, pointer flips
      stage("snap-001", src.filter(col("event_date") >= lit(K10_B1_FROM)
        && col("event_date") < lit(K10_B2_FROM)))
      val (b1n, b1null, b1bound) = audit("snap-001")
      val b1ok = b1n > 0 && b1null == 0 && b1bound == 0
      if (b1ok) setPointer(getPointer + ",snap-001")
      // batch 2: the poisoned window — upstream nulled keys and
      // negated values; audits fail, pointer must NOT move
      stage("snap-002", src.filter(col("event_date") >= lit(K10_B2_FROM))
        .withColumn("event_type",
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")))
        .withColumn("value",
          when(col("event_id") % 11 === 0, -col("value"))
            .otherwise(col("value"))))
      val (b2n, b2null, b2bound) = audit("snap-002")
      val b2ok = b2n > 0 && b2null == 0 && b2bound == 0
      if (b2ok) setPointer(getPointer + ",snap-002")
      // the published read path: pointer → snapshot dirs, nothing else
      val live = getPointer.split(",").map(p => s.read.parquet(s"$lake/$p"))
        .reduce(_ unionByName _)
      (live, b1ok, b2ok, b2null, b2bound)
  }

  val k10WriteAuditPublish = Q(
    "k10_write_audit_publish",
    (s, d) => {
      val (live, b1ok, b2ok, b2null, b2bound) =
        k10Protocol(s, d, "k10_lake")
      live.groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .withColumn("b1_published", lit(b1ok))
        .withColumn("b2_published", lit(b2ok))
        .withColumn("b2_null_viol", lit(b2null))
        .withColumn("b2_bound_viol", lit(b2bound))
    },
    // the oracle replays the protocol relationally: re-poison batch 2
    // exactly as the engine staged it, then apply the AUDIT'S OWN
    // predicates (key null, value < 0) to derive both the violation
    // counts and the publish booleans — nothing is hardcoded, so a
    // regenerated events fixture (e.g. one where a negated value is 0
    // or null and trips no bound audit) moves the oracle and the
    // engine together instead of silently diverging (ADVICE r15 #1)
    Some(s"""WITH d AS (
        SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
        FROM events),
      b1 AS (SELECT * FROM d
             WHERE event_date >= DATE '$K10_B1_FROM'
               AND event_date < DATE '$K10_B2_FROM'),
      b2p AS (
        SELECT event_id,
          CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
            AS event_type,
          CASE WHEN event_id % 11 = 0 THEN -value ELSE value END AS value,
          event_date
        FROM d WHERE event_date >= DATE '$K10_B2_FROM'),
      a1 AS (
        SELECT count(*) AS n,
          CAST(count(CASE WHEN event_id IS NULL
            OR event_type IS NULL THEN 1 END) AS BIGINT) AS null_viol,
          CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT)
            AS bound_viol
        FROM b1),
      a2 AS (
        SELECT count(*) AS n,
          CAST(count(CASE WHEN event_id IS NULL
            OR event_type IS NULL THEN 1 END) AS BIGINT) AS null_viol,
          CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT)
            AS bound_viol
        FROM b2p),
      flags AS (
        SELECT
          (SELECT n > 0 AND null_viol = 0 AND bound_viol = 0 FROM a1)
            AS b1ok,
          (SELECT n > 0 AND null_viol = 0 AND bound_viol = 0 FROM a2)
            AS b2ok),
      pub AS (
        SELECT event_id, event_type, value, event_date FROM d
        WHERE event_date < DATE '$K10_B1_FROM'
        UNION ALL
        SELECT event_id, event_type, value, event_date FROM b1
        WHERE (SELECT b1ok FROM flags)
        UNION ALL
        SELECT event_id, event_type, value, event_date FROM b2p
        WHERE (SELECT b2ok FROM flags))
      SELECT event_date, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        (SELECT b1ok FROM flags) AS b1_published,
        (SELECT b2ok FROM flags) AS b2_published,
        (SELECT null_viol FROM a2) AS b2_null_viol,
        (SELECT bound_viol FROM a2) AS b2_bound_viol
      FROM pub
      GROUP BY event_date"""))

  // ---------------------------------------------------------------------
  // E3: the Strava streams pipeline restated end to end (SURVEY §3 E3):
  //   snapshot (orders) → date-range filter (F1/F2) → distinct ids (A3)
  //   → per-key stream rows (semi-join = the per-activity fetch, J3)
  //   → cached ∪ fresh with the INTENDED §2.12.3 semantics (U1)
  //   → join-enrich with activity metadata (J1, the commented-out merge)
  //   → union sink written and read back (K5).
  // Cached = ids below a deterministic threshold (standing in for files
  // already in the lake), fresh = the rest.
  // ---------------------------------------------------------------------
  val e3StreamsPipeline = Q(
    "e3_streams_pipeline",
    (s, d) => {
      val out = freshDir("e3_all_streams")
      val activities = orders(s, d)
        .filter(to_date(col("o_orderdate")) >= lit("1998-01-01") &&
          to_date(col("o_orderdate")) <= lit("1999-12-31"))
      val ids = activities.select(col("o_orderkey").as("activity_id"))
        .distinct()
      val streams = lineitem(s, d)
        .select(col("l_orderkey").as("activity_id"),
          col("l_linenumber").as("time"),
          col("l_quantity").as("distance"))
      val cachedIds = ids.filter(col("activity_id") % 4 === 0)
      val freshIds = ids.join(cachedIds, Seq("activity_id"), "left_anti")
      val cached = streams.join(cachedIds, Seq("activity_id"), "left_semi")
        .withColumn("src", lit("cached"))
      val fresh = streams.join(freshIds, Seq("activity_id"), "left_semi")
        .withColumn("src", lit("fetched"))
      val enriched = cached.unionByName(fresh)
        .join(activities.select(col("o_orderkey").as("activity_id"),
          col("o_orderpriority").as("sport_type")), Seq("activity_id"))
      enriched.write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    },
    Some("""WITH ids AS (
        SELECT o_orderkey AS activity_id, o_orderpriority AS sport_type
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
          AND CAST(o_orderdate AS DATE) <= DATE '1999-12-31')
      SELECT l_orderkey AS activity_id, l_linenumber AS time,
        l_quantity AS distance,
        CASE WHEN l_orderkey % 4 = 0 THEN 'cached' ELSE 'fetched' END AS src,
        sport_type
      FROM lineitem JOIN ids ON l_orderkey = activity_id"""))

  // ---------------------------------------------------------------------
  // S2/S3/S4: the REST intraday source as a DataSource V2 connector
  // (graft.sources.rest.RestIntradaySource): one InputPartition per
  // (day, resource), date/resource predicates pushed down to PRUNE the
  // partition list before any fetch, column pruning as the keys= analog.
  // The deterministic payload generator is replayed by the oracle, so
  // even the custom connector is hash-checked end to end.
  // ---------------------------------------------------------------------
  val s2RestSource = Q(
    "s2s3s4_rest_source",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "calories,heart,steps")
        .option("start", "2024-01-01").option("end", "2024-01-31")
        .load()
        .filter(col("date") >= lit("2024-01-10") &&
          col("date") <= lit("2024-01-16") &&
          col("resource").isin("calories", "steps"))
        .select("resource", "date", "time", "value"),
    Some("""WITH days AS (
        SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS date
        FROM generate_series(DATE '2024-01-10', DATE '2024-01-16',
                             INTERVAL 1 DAY) t(g)),
      res AS (SELECT unnest(['calories', 'steps']) AS resource),
      mins AS (
        SELECT lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time
        FROM generate_series(0, 1439) t2(m))
      SELECT resource, date, time,
        CAST(concat('0x', substring(md5(
          concat('iv|', resource, '|', date, '|', time)), 1, 15))
          AS BIGINT) % 1000 AS value
      FROM res CROSS JOIN days CROSS JOIN mins"""))

  // ---------------------------------------------------------------------
  // S2b: heart at its TRUE 1-second detail grain — the reference fetches
  // `1sec` for heart, `1min` for everything else
  // (fitbit_utils.py:419-423). One pushed (date, resource) pair prunes
  // the fetch list to a single 86,400-row partition.
  // ---------------------------------------------------------------------
  val s2bHeart1sec = Q(
    "s2b_heart_1sec",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "heart,steps")
        .option("start", "2024-01-01").option("end", "2024-01-31")
        .load()
        .filter(col("date") === lit("2024-01-15") &&
          col("resource") === lit("heart"))
        .select("resource", "date", "time", "value"),
    Some("""SELECT 'heart' AS resource, '2024-01-15' AS date,
        lpad(CAST(x // 3600 AS VARCHAR), 2, '0') || ':' ||
        lpad(CAST((x // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
        lpad(CAST(x % 60 AS VARCHAR), 2, '0') AS time,
        CAST(concat('0x', substring(md5(concat('iv|heart|2024-01-15|',
          lpad(CAST(x // 3600 AS VARCHAR), 2, '0') || ':' ||
          lpad(CAST((x // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
          lpad(CAST(x % 60 AS VARCHAR), 2, '0'))), 1, 15))
          AS BIGINT) % 1000 AS value
      FROM generate_series(0, 86399) t(x)"""))

  // ---------------------------------------------------------------------
  // S2c: BOTH resource families through one scan — intraday (steps,
  // per-day fetch, minute rows) plus thirty-day (hrv/sleep, per-WINDOW
  // fetch, daily rows; globals.py:15, fitbit_utils.py:427-457). The
  // pushed date range clips the thirty-day windows and prunes whole
  // windows that fall outside it.
  // ---------------------------------------------------------------------
  val s2cThirtyDay = Q(
    "s2c_thirty_day",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "steps,hrv,sleep")
        .option("start", "2024-01-01").option("end", "2024-03-30")
        .load()
        .filter(col("date") >= lit("2024-01-20") &&
          col("date") <= lit("2024-02-10"))
        .select("resource", "date", "time", "value"),
    Some("""WITH days AS (
        SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS date
        FROM generate_series(DATE '2024-01-20', DATE '2024-02-10',
                             INTERVAL 1 DAY) t(g)),
      mins AS (
        SELECT lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time
        FROM generate_series(0, 1439) t2(m)),
      rows_ AS (
        SELECT 'steps' AS resource, date, time FROM days CROSS JOIN mins
        UNION ALL
        SELECT r AS resource, date, '00:00' AS time
        FROM (SELECT unnest(['hrv', 'sleep']) AS r) CROSS JOIN days)
      SELECT resource, date, time,
        CAST(concat('0x', substring(md5(
          concat('iv|', resource, '|', date, '|', time)), 1, 15))
          AS BIGINT) % 1000 AS value
      FROM rows_"""))

  // ---------------------------------------------------------------------
  // F6 driver-visible: the 404 path as a relational result. Days listed
  // in `missingDates` plan ZERO-date fetch units (the reference treats a
  // 404 day as absent and moves on, utils.py:349-351): the per-date
  // rowcounts must show every present day at its full grain and the
  // missing days entirely absent — no nulls, no error rows. Previously
  // proven only in RestSourceSpec; this query puts the same mechanism
  // through the DuckDB hash gate.
  // ---------------------------------------------------------------------
  val f6MissingDates = Q(
    "f6_missing_dates",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "steps")
        .option("start", "2024-02-01").option("end", "2024-02-10")
        .option("missingDates", "2024-02-03,2024-02-07")
        .load()
        .groupBy(col("date"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value")),
    Some("""WITH days AS (
        SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS date
        FROM generate_series(DATE '2024-02-01', DATE '2024-02-10',
                             INTERVAL 1 DAY) t(g)
        WHERE strftime(CAST(g AS DATE), '%Y-%m-%d')
          NOT IN ('2024-02-03', '2024-02-07')),
      mins AS (
        SELECT lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time
        FROM generate_series(0, 1439) t2(m))
      SELECT date, count(*) AS n_rows,
        CAST(sum(CAST(concat('0x', substring(md5(
          concat('iv|steps|', date, '|', time)), 1, 15))
          AS BIGINT) % 1000) AS BIGINT) AS sum_value
      FROM days CROSS JOIN mins
      GROUP BY date"""))

  // ---------------------------------------------------------------------
  // F8 driver-visible: resource validation as a relational result. The
  // connector rejects an unsupported resource at ANALYSIS time — the
  // reference's ValueError (fitbit_utils.py:415-417) — so the probe
  // drives `load()` itself and records whether table resolution
  // succeeded. The `accepted=false` row can ONLY appear if getTable's
  // require actually threw; nothing is fabricated.
  // ---------------------------------------------------------------------
  val f8ResourceValidation = Q(
    "f8_resource_validation",
    (s, _) => {
      import s.implicits._
      def probe(res: String): (String, Boolean, String) =
        try {
          s.read.format("graft.sources.rest.RestIntradaySource")
            .option("resources", res)
            .option("start", "2024-01-01").option("end", "2024-01-01")
            .load()
          (res, true, "")
        } catch {
          case e: IllegalArgumentException =>
            (res, false,
              if (e.getMessage.contains("Unsupported resource"))
                "unsupported_resource"
              else "other")
        }
      Seq(probe("steps"), probe("heart"), probe("stairs"))
        .toDF("resource", "accepted", "reject_reason")
    },
    Some("""SELECT * FROM (VALUES
        ('steps', true, ''),
        ('heart', true, ''),
        ('stairs', false, 'unsupported_resource'))
      t(resource, accepted, reject_reason)"""))

  // ---------------------------------------------------------------------
  // S2d driver-visible: retry/backoff + pacing under injected 429s. Two
  // of five days fail their first TWO fetch attempts with a simulated
  // 429 (simulate429Count=2 < maxRetries=3), and every fetch passes
  // through the per-JVM token bucket — so a hash-identical result to
  // the fault-free oracle is possible ONLY if the retry loop recovered
  // each failing unit. The reference's sleep-and-retry discipline
  // (fitbit_utils.py:38-43,309-329; utils.py:337-347) proven through
  // the correctness gate instead of only RestSourceSpec.
  // ---------------------------------------------------------------------
  val s2dRetry429 = Q(
    "s2d_retry_429",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "steps,calories")
        .option("start", "2024-03-01").option("end", "2024-03-05")
        .option("simulate429Dates", "2024-03-02,2024-03-04")
        .option("simulate429Count", "2")
        .option("maxRetries", "3")
        .option("retryBackoffMs", "1")
        .option("maxRequestsPerSecond", "1000")
        .load()
        .groupBy(col("resource"), col("date"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value")),
    Some("""WITH days AS (
        SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS date
        FROM generate_series(DATE '2024-03-01', DATE '2024-03-05',
                             INTERVAL 1 DAY) t(g)),
      res AS (SELECT unnest(['steps', 'calories']) AS resource),
      mins AS (
        SELECT lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time
        FROM generate_series(0, 1439) t2(m))
      SELECT resource, date, count(*) AS n_rows,
        CAST(sum(CAST(concat('0x', substring(md5(
          concat('iv|', resource, '|', date, '|', time)), 1, 15))
          AS BIGINT) % 1000) AS BIGINT) AS sum_value
      FROM res CROSS JOIN days CROSS JOIN mins
      GROUP BY resource, date"""))

  // ---------------------------------------------------------------------
  // S2e driver-visible: the credential lifecycle through the same
  // connector (fitbit_utils.py:116-154 acquire, 157-185 refresh, minus
  // the browser). The sim server rejects any token below generation 2
  // (simulate401MinGen=2); the GenTokenProvider starts at gen 0, so the
  // FIRST fetch unit must walk 401 → refresh → 401 → refresh → 200
  // before any row flows, and every later unit rides the refreshed
  // JVM-wide credential. A hash-identical result to the fault-free
  // oracle is possible ONLY if refresh-on-401 actually recovered the
  // scan — an unrecovered 401 fails the query loudly, never silently
  // yields fewer rows. Refresh single-flight + failure-path contracts
  // are spec'd in RestSourceSpec.
  // ---------------------------------------------------------------------
  val s2eTokenRefresh = Q(
    "s2e_token_refresh",
    (s, _) =>
      s.read.format("graft.sources.rest.RestIntradaySource")
        .option("resources", "steps,calories")
        .option("start", "2024-04-01").option("end", "2024-04-05")
        .option("tokenProvider", "graft.sources.rest.GenTokenProvider")
        .option("simulate401MinGen", "2")
        .option("maxRetries", "3")
        .load()
        .groupBy(col("resource"), col("date"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value")),
    Some("""WITH days AS (
        SELECT strftime(CAST(g AS DATE), '%Y-%m-%d') AS date
        FROM generate_series(DATE '2024-04-01', DATE '2024-04-05',
                             INTERVAL 1 DAY) t(g)),
      res AS (SELECT unnest(['steps', 'calories']) AS resource),
      mins AS (
        SELECT lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time
        FROM generate_series(0, 1439) t2(m))
      SELECT resource, date, count(*) AS n_rows,
        CAST(sum(CAST(concat('0x', substring(md5(
          concat('iv|', resource, '|', date, '|', time)), 1, 15))
          AS BIGINT) % 1000) AS BIGINT) AS sum_value
      FROM res CROSS JOIN days CROSS JOIN mins
      GROUP BY resource, date"""))

  // ---------------------------------------------------------------------
  // S10: snapshot diff — the CDC primitive over K2's date-stamped
  // snapshots: given the same keyed aggregate taken at two cuts, emit
  // added / removed / changed keys (the upsert-and-tombstone stream a
  // downstream consumer applies). One full-outer join on the snapshot
  // key; at 100 TB both snapshot builds aggregate map-side to one row
  // per key and the join shuffles only the two key-narrow state tables,
  // so the diff costs O(state), not O(events). Value sums accumulate in
  // DECIMAL cast to double on both sides, so the 'changed' equality
  // test compares identical doubles, and the unchanged majority is
  // dropped before the result edge.
  // Ref intent: services' date-stamped snapshot reconciliation
  // (utils.py:299-333 snapshot listing + latest-pick).
  // ---------------------------------------------------------------------
  val s10SnapshotDiff = Q(
    "s10_snapshot_diff",
    (s, d) => {
      def snap(day: String) = graft.Tables.events(s, d)
        .filter(to_date(col("ts")) === lit(day))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      val a = snap("2024-01-10").select(col("user_id"), col("event_type"),
        col("n").as("old_n"), col("v").as("old_v"))
      val b = snap("2024-01-20").select(col("user_id"), col("event_type"),
        col("n").as("new_n"), col("v").as("new_v"))
      a.join(b, Seq("user_id", "event_type"), "full_outer")
        .withColumn("change_type",
          when(col("old_n").isNull, lit("added"))
            .when(col("new_n").isNull, lit("removed"))
            .when(col("old_n") =!= col("new_n") ||
              col("old_v") =!= col("new_v"), lit("changed"))
            .otherwise(lit("unchanged")))
        .filter(col("change_type") =!= "unchanged")
        .select(col("user_id"), col("event_type"), col("change_type"),
          col("old_n"), col("new_n"),
          round(col("old_v"), 6).as("old_v"),
          round(col("new_v"), 6).as("new_v"))
    },
    Some("""WITH ev AS (
        SELECT user_id, event_type,
          CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
        FROM events),
      a AS (
        SELECT user_id, event_type, count(*) AS old_n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS old_v
        FROM ev WHERE day = DATE '2024-01-10' GROUP BY 1, 2),
      b AS (
        SELECT user_id, event_type, count(*) AS new_n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS new_v
        FROM ev WHERE day = DATE '2024-01-20' GROUP BY 1, 2),
      j AS (
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
          coalesce(a.event_type, b.event_type) AS event_type,
          CASE WHEN a.old_n IS NULL THEN 'added'
               WHEN b.new_n IS NULL THEN 'removed'
               WHEN a.old_n <> b.new_n OR a.old_v <> b.new_v THEN 'changed'
               ELSE 'unchanged' END AS change_type,
          old_n, new_n, old_v, new_v
        FROM a FULL OUTER JOIN b
          ON a.user_id = b.user_id AND a.event_type = b.event_type)
      SELECT user_id, event_type, change_type, old_n, new_n,
        round(old_v, 6) AS old_v, round(new_v, 6) AS new_v
      FROM j WHERE change_type <> 'unchanged'"""))

  // ---------------------------------------------------------------------
  // S11: heterogeneous-generation scan — one logical events table whose
  // files were written by different producers over the lake's lifetime
  // with different PHYSICAL timestamp types (epoch-nanos INT64 vs
  // TIMESTAMP micros). This is the normal state of a 100 TB lake (and
  // exactly the drift that broke 13 queries when the driver's round-10
  // testdata regeneration flipped the type): the LOADER owns
  // normalization, queries see one canonical schema. The query reads
  // both generation fixtures through Tables.events' adaptive
  // normalization and reports per-(generation, type) counts and
  // micro-formatted time bounds; the oracle restates the aggregate over
  // the BASE events table crossed with the generation labels — every
  // cell matches iff both physical forms decode to the exact base
  // instants (a mis-zoned NTZ reinterpretation or an off-by-10³ nanos
  // divide would shift first_ts/last_ts and fail the hash).
  // ---------------------------------------------------------------------
  /** Three events-shaped generation dirs derived from the base table:
    * epoch-nanos INT64, TIMESTAMP_NTZ micros, and an "evolved" v2 that
    * additionally DROPS props and ADDS a schema_ver column — the
    * column-delta half of lake drift alongside the physical-ts half.
    * Exposed so Bench's warmup pre-materializes them (fixture writes
    * are scaffolding, not part of the measured scan). */
  private[graft] def s11GenFixtures(
      s: SparkSession, d: String): (String, String, String) = {
    val nanos = memoFixture("s11_gen_nanos", d) { out =>
      events(s, d)
        .withColumn("ts", expr("unix_micros(ts) * 1000L"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    val ntz = memoFixture("s11_gen_ntz", d) { out =>
      events(s, d)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    val evolved = memoFixture("s11_gen_evolved", d) { out =>
      events(s, d)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .drop("props")
        .withColumn("schema_ver", lit(2))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    (nanos, ntz, evolved)
  }

  val s11GenerationUnion = Q(
    "s11_generation_union",
    (s, d) => {
      val (nanosDir, ntzDir, evolvedDir) = s11GenFixtures(s, d)
      def gen(dir: String, label: String) =
        graft.Tables.events(s, dir).withColumn("generation", lit(label))
      // n_props counts surviving props values: the evolved generation
      // dropped the column, the loader null-fills it, and the count
      // reading 0 (vs n on the other generations) proves the fill is
      // the loader's, not a silent column-position misread
      gen(nanosDir, "nanos_int64")
        .unionByName(gen(ntzDir, "micros_ntz"))
        .unionByName(gen(evolvedDir, "evolved_v2"))
        .groupBy(col("generation"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("first_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("last_ts"),
          count(col("props")).as("n_props"))
    },
    Some("""WITH gens AS (
        SELECT 'nanos_int64' AS generation
        UNION ALL SELECT 'micros_ntz'
        UNION ALL SELECT 'evolved_v2'),
      agg AS (
        SELECT event_type, count(*) AS n,
          strftime(min(CAST(ts AS TIMESTAMP)),
            '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
          strftime(max(CAST(ts AS TIMESTAMP)),
            '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
          count(props) AS n_props_base
        FROM events GROUP BY 1)
      SELECT g.generation, a.event_type, a.n, a.first_ts, a.last_ts,
        CAST(CASE WHEN g.generation = 'evolved_v2' THEN 0
             ELSE a.n_props_base END AS BIGINT) AS n_props
      FROM gens g CROSS JOIN agg a"""))

  /** All sink/ingest/catalog queries, registration order. */
  // ---------------------------------------------------------------------
  // K8: ANN index sink — the serving deployment a17's pin comment
  // promises, actually run: build the NSW edge list ONCE, write it to
  // parquet clustered by source node (a served shard reads one node's
  // adjacency from one file neighborhood), read it back, and run the
  // SAME greedy beam against the served index. Shares a17's oracle, so
  // a green row PROVES write → read → search loses nothing — the
  // on-disk index reproduces the in-memory search bit-for-bit. At
  // 100 TB this parquet table IS the index artifact a search tier
  // loads; rebuild cost amortizes across every query served from it
  // (and a18's delta edge list appends to exactly this table).
  // ---------------------------------------------------------------------
  val k8AnnIndexSink = Q(
    "k8_ann_index_sink",
    (s, d) => {
      val out = freshDir("k8_index")
      graft.operators.Ann.nswEdges(s, d)
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out)
      graft.operators.Ann.nswSearchOver(s, d, s.read.parquet(out))
    },
    graft.operators.Ann.a17NswSearch.oracle)

  // ---------------------------------------------------------------------
  // K8b: the HIERARCHICAL index through the same sink discipline
  // (VERDICT r14 #2) — a19's per-layer edge lists written as ONE
  // parquet table partitioned by layer (elvl=K directories; rows
  // clustered by source node within each, so a served shard reads one
  // layer's adjacency with partition pruning + one node's edges from
  // one file neighborhood), read back, and a19's descent re-run over
  // the served artifact. Shares a19's oracle: a green row proves the
  // layered write → read → hierarchical search loses nothing. This is
  // the serving story a19's cost profile wants — the layer builds
  // (its dominant cost) amortize across every query served from the
  // table, and a18's delta edges append per layer.
  // ---------------------------------------------------------------------
  val k8bHnswIndexSink = Q(
    "k8b_hnsw_index_sink",
    (s, d) => {
      val out = freshDir("k8b_index")
      graft.operators.Ann.hnswEdgesAll(s, d)
        .repartition(8, col("elvl"), col("v"))
        .write.mode("overwrite").partitionBy("elvl").parquet(out)
      graft.operators.Ann.hnswDescentOver(s, d, s.read.parquet(out))
    },
    graft.operators.Ann.a19HnswLayers.oracle)

  // ---------------------------------------------------------------------
  // K8c: the incremental-serving loop CLOSED end to end (VERDICT r15
  // #2) — the production lifecycle a15/a18/k8 each proved one third
  // of: BUILD the standing index (a18's standing slice only — what a
  // search tier deployed yesterday), SINK it to parquet, EXTEND with
  // a18's delta edge list for today's arrivals, APPEND the delta (both
  // directions — the back-edges are what make arrivals REACHABLE) into
  // the same table files, then RE-SEARCH through the read-back
  // artifact. Until now a18 emitted deltas nothing consumed and k8
  // re-searched an index nothing extended.
  //
  // The oracle replays the whole loop relationally: the standing build
  // sizes its buckets from the STANDING count (the a15 frozen-sizing
  // discipline — both the served index and the delta replay see the
  // same geometry), the delta re-derives a18's three families, and the
  // search walks standing ∪ delta. A green row proves build → sink →
  // extend → append → serve loses nothing. At 100 TB the append is the
  // nightly index maintenance job: O(batch) new files joining the
  // table, zero rewrite of standing shards. AnnGraphSpec plants an
  // arrival whose absence/presence flips a probe's top-K — reachable
  // ONLY through appended back-edges. Cap observability: the standing
  // build's bucket families are the SAME capped surface d13_cap_report
  // already accounts under its a18 standing-side rows (identical
  // membership slice, identical frozen sizing), so a saturated
  // standing bucket is driver-visible there.
  // ---------------------------------------------------------------------
  val k8cIncrementalIndexSink = Q(
    "k8c_incremental_index_sink",
    (s, d) => {
      import graft.operators.Ann
      val out = freshDir("k8c_index")
      val standing = Ann.a18Standing(
        graft.Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("emb")))
      Ann.nswEdgesFrom(s, standing)
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out)
      val delta = Ann.a18DeltaOut(s, d)
      delta.select(col("src").as("v"), col("dst").as("n"))
        .unionByName(
          delta.select(col("dst").as("v"), col("src").as("n")))
        .repartition(2, col("v"))
        .write.mode("append").parquet(out)
      Ann.nswSearchOver(s, d, s.read.parquet(out).select("v", "n"))
    },
    Some {
      import graft.operators.Ann
      s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
      ${Ann.a18DeltaDuckCtes},
      ${Ann.nswBuildDuck("k",
        "(SELECT vec_id, embedding FROM embeddings " +
          "WHERE vec_id % 10 <> 0)")},
      alledges AS (
        SELECT v, n FROM kedges
        UNION SELECT src AS v, dst AS n FROM outs
        UNION SELECT dst AS v, src AS n FROM outs),
      ${Ann.nswSearchDuck("alledges")}"""
    })

  // ---------------------------------------------------------------------
  // K8d: the HIERARCHICAL incremental-serving loop closed (VERDICT r16
  // #1) — k8c's build → sink → extend → append → re-search lifecycle on
  // the index shape that matters at 100 TB: a19's layered graph. The
  // standing slice's layers are built with per-layer frozen sizing
  // (hnswEdgesAllFrom over the standing members), sunk as k8b's
  // elvl-partitioned table, then a24's per-layer deltas append BOTH
  // directions into the same partitions (an arrival promoted to layer
  // k>0 gains upper-layer edges, so the DESCENT — not just the base
  // beam — can route through it), and a19's descent re-runs over the
  // read-back artifact. The oracle replays the whole loop: standing
  // layer builds (same member predicate), a24's delta recurrences, the
  // per-layer union, and the IDENTICAL descent text a19 uses — a green
  // row proves the nightly layered-index maintenance job loses
  // nothing. Append cost: O(batch · Σ 8^-k) new files per layer
  // partition, zero rewrite of standing shards.
  // ---------------------------------------------------------------------
  val k8dHnswIncrementalSink = Q(
    "k8d_hnsw_incremental_sink",
    (s, d) => {
      import graft.operators.Ann
      val out = freshDir("k8d_index")
      val standing = Ann.a18Standing(
        graft.Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("emb")))
      Ann.hnswEdgesAllFrom(s, standing)
        .repartition(8, col("elvl"), col("v"))
        .write.mode("overwrite").partitionBy("elvl").parquet(out)
      val delta = Ann.a24DeltaOut(s, d)
      delta.select(col("elvl"), col("src").as("v"), col("dst").as("n"))
        .unionByName(delta.select(col("elvl"), col("dst").as("v"),
          col("src").as("n")))
        .repartition(2, col("v"))
        .write.mode("append").partitionBy("elvl").parquet(out)
      Ann.hnswDescentOver(s, d, s.read.parquet(out))
    },
    Some {
      import graft.operators.Ann
      val standingLayers = (0 to Ann.HNSW_MAXL)
        .map(k => Ann.hnswLayerEdgesDuck(k, " AND em.vec_id % 10 <> 0"))
        .mkString(",\n      ")
      val unions = (0 to Ann.HNSW_MAXL).map { k =>
        s"""aledges$k AS (
          SELECT v, n FROM ledges$k
          UNION SELECT src AS v, dst AS n FROM l${k}outs
          UNION SELECT dst AS v, src AS n FROM l${k}outs)"""
      }.mkString(",\n      ")
      s"""WITH ${Ann.hnswBaseDuckCtes},
      $standingLayers,
      ${Ann.a24DeltaDuckLayers},
      $unions,
      ${Ann.hnswDescentDuckTail(k => s"aledges$k")}"""
    })

  // ---------------------------------------------------------------------
  // K8c/K8d split (VERDICT r19 #1): the full-lifecycle rows above
  // deliberately re-run the O(corpus) standing build every invocation,
  // so their benched numbers (and probe slopes) measure the BUILD, not
  // the O(batch) append they exist to demonstrate — k8c's raw per-3x
  // slope read ~2.5x at the 100x probe for exactly this reason. These
  // rows split the lifecycle at the seam a nightly deployment has:
  //   k8c_standing_build — the build+sink alone, measured and pinned
  //   separately (the rebuild-cadence cost that amortizes across every
  //   query served from the artifact);
  //   k8c_append_search / k8d_append_search — append + re-search
  //   against a PRE-SUNK standing artifact (built once per
  //   (JVM, dataset) via the memoFixture discipline and
  //   pre-materialized in Bench's warmup, exactly how the nightly job
  //   finds yesterday's index already on disk). The append writes
  //   today's delta shards NEXT TO the standing table (a parquet
  //   append IS new files in the same table; scanning standing ∪ delta
  //   is the same read) and re-searches through the read-back union.
  // Both append rows share the full-lifecycle oracles, so the split
  // path provably serves the SAME results — and their probes are the
  // honest corpus-independence read the a18/a24 design claims.
  // ---------------------------------------------------------------------
  private[graft] def k8cStandingFixture(s: SparkSession, d: String): String =
    memoFixture("k8c_standing", d) { out =>
      import graft.operators.Ann
      val standing = Ann.a18Standing(
        graft.Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("emb")))
      Ann.nswEdgesFrom(s, standing)
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out)
    }

  private[graft] def k8dStandingFixture(s: SparkSession, d: String): String =
    memoFixture("k8d_standing", d) { out =>
      import graft.operators.Ann
      val standing = Ann.a18Standing(
        graft.Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("emb")))
      Ann.hnswEdgesAllFrom(s, standing)
        .repartition(8, col("elvl"), col("v"))
        .write.mode("overwrite").partitionBy("elvl").parquet(out)
    }

  val k8cStandingBuild = Q(
    "k8c_standing_build",
    (s, d) => {
      import graft.operators.Ann
      val out = freshDir("k8c_build_only")
      val standing = Ann.a18Standing(
        graft.Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("emb")))
      Ann.nswEdgesFrom(s, standing)
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("v")).as("n_nodes"))
    },
    Some {
      import graft.operators.Ann
      s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
      ${Ann.nswBuildDuck("k",
        "(SELECT vec_id, embedding FROM embeddings " +
          "WHERE vec_id % 10 <> 0)")}
      SELECT CAST(count(*) AS BIGINT) AS n_edges,
             CAST(count(DISTINCT v) AS BIGINT) AS n_nodes
      FROM kedges"""
    })

  val k8cAppendSearch = Q(
    "k8c_append_search",
    (s, d) => {
      import graft.operators.Ann
      val standingDir = k8cStandingFixture(s, d)
      val deltaDir = freshDir("k8c_delta")
      val delta = Ann.a18DeltaOut(s, d)
      delta.select(col("src").as("v"), col("dst").as("n"))
        .unionByName(
          delta.select(col("dst").as("v"), col("src").as("n")))
        .repartition(2, col("v"))
        .write.mode("overwrite").parquet(deltaDir)
      Ann.nswSearchOver(s, d,
        s.read.parquet(standingDir).select("v", "n")
          .unionByName(s.read.parquet(deltaDir).select("v", "n")))
    },
    k8cIncrementalIndexSink.oracle)

  val k8dAppendSearch = Q(
    "k8d_append_search",
    (s, d) => {
      import graft.operators.Ann
      val standingDir = k8dStandingFixture(s, d)
      val deltaDir = freshDir("k8d_delta")
      val delta = Ann.a24DeltaOut(s, d)
      delta.select(col("elvl"), col("src").as("v"), col("dst").as("n"))
        .unionByName(delta.select(col("elvl"), col("dst").as("v"),
          col("src").as("n")))
        .repartition(2, col("v"))
        .write.mode("overwrite").partitionBy("elvl").parquet(deltaDir)
      Ann.hnswDescentOver(s, d,
        s.read.parquet(standingDir).select("elvl", "v", "n")
          .unionByName(
            s.read.parquet(deltaDir).select("elvl", "v", "n")))
    },
    k8dHnswIncrementalSink.oracle)

  // ---------------------------------------------------------------------
  // K14: erasure from the SERVED vector index — the other half of the
  // GDPR story k11 tells for the lake table: when a user's vectors must
  // go, the search tier can't wait for a rebuild. Production stores do
  // it in two steps, both run here against the same parquet artifact k8
  // serves:
  //   TOMBSTONE (logical, instant): erased ids are masked from the
  //   final top-K but the beam still traverses THROUGH them — deleting
  //   their connectivity immediately would orphan whatever was
  //   reachable only via them (the spec plants exactly that node);
  //   COMPACT (physical, batched): the edge table is rewritten without
  //   any edge touching an erased id, and the corpus frame drops the
  //   erased vectors, so entries/scoring can't see them either. The
  //   rewrite is O(index), not O(corpus·dim), and amortizes across the
  //   tombstone batch — exactly the nightly-maintenance shape.
  // Output: the SAME probe set searched in all three states (phase
  // before|tombstoned|compacted) plus the compaction's edge accounting,
  // so "what did erasure cost in recall" is driver-visible per probe:
  // a result present before and gone after compaction was reachable
  // only through erased connectivity. Oracle replays all three
  // searches (the tagged nswSearchDuckCtes) over the replayed build.
  // ---------------------------------------------------------------------
  val k14IndexErasure = Q(
    "k14_index_erasure",
    (s, d) => {
      import graft.operators.Ann
      def del(c: org.apache.spark.sql.Column) = c % 9 === 8
      val out = freshDir("k14_index")
      Ann.nswEdges(s, d)
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out)
      val served = s.read.parquet(out).select("v", "n")
      val corpus = graft.Tables.table(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").as("emb"))
      // r20: before/tombstoned traverse the SAME beam by the tombstone
      // semantics (only the final top-K mask differs) — compute the
      // checkpointed beam once and derive both phases from it, instead
      // of re-running all NSW_HOPS hops twice
      val beam = Ann.nswFinalBeam(s, corpus, served)
      val before = Ann.nswTopkFrom(beam, None)
        .select(lit("before").as("phase"), col("probe_id"),
          col("vec_id"), col("sim"), col("rank"),
          lit(0L).as("edges_dropped"))
      val tomb = Ann.nswTopkFrom(beam, Some(del(col("vec_id"))))
        .select(lit("tombstoned").as("phase"), col("probe_id"),
          col("vec_id"), col("sim"), col("rank"),
          lit(0L).as("edges_dropped"))
      val out2 = freshDir("k14_compacted")
      served.filter(!(del(col("v")) || del(col("n"))))
        .repartition(8, col("v"))
        .write.mode("overwrite").parquet(out2)
      val cedges = s.read.parquet(out2).select("v", "n")
      val dropped = served
        .agg(sum(when(del(col("v")) || del(col("n")), lit(1L))
          .otherwise(lit(0L))).as("edges_dropped"))
      val comp = Ann
        .nswSearchOverMasked(s, corpus.filter(!del(col("vec_id"))),
          cedges, None)
        .crossJoin(broadcast(dropped))
        .select(lit("compacted").as("phase"), col("probe_id"),
          col("vec_id"), col("sim"), col("rank"), col("edges_dropped"))
      before.unionByName(tomb).unionByName(comp)
    },
    Some {
      import graft.operators.Ann
      s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
      ${Ann.nswBuildDuck("", "embeddings")},
      bedges AS MATERIALIZED (SELECT v, n FROM edges),
      ${Ann.nswSearchDuckCtes("b", "bedges", "e", None)},
      ${Ann.nswSearchDuckCtes("t", "bedges", "e",
        Some("vec_id % 9 = 8"))},
      cedges AS MATERIALIZED (
        SELECT v, n FROM bedges WHERE v % 9 <> 8 AND n % 9 <> 8),
      ce AS MATERIALIZED (SELECT * FROM e WHERE vec_id % 9 <> 8),
      ${Ann.nswSearchDuckCtes("c", "cedges", "ce", None)},
      dropped AS (SELECT CAST(count(*) AS BIGINT) AS edges_dropped
        FROM bedges WHERE v % 9 = 8 OR n % 9 = 8)
      SELECT 'before' AS phase, probe_id, vec_id, sim, rank,
        CAST(0 AS BIGINT) AS edges_dropped FROM bres
      UNION ALL
      SELECT 'tombstoned', probe_id, vec_id, sim, rank, CAST(0 AS BIGINT)
      FROM tres
      UNION ALL
      SELECT 'compacted', probe_id, vec_id, sim, rank, d.edges_dropped
      FROM cres CROSS JOIN dropped d"""
    })

  def all: Seq[Q] = Seq(
    k1PartitionedSink, k2SnapshotSink, k3SchemaWrite, k6Compaction, k7Retention,
    k8AnnIndexSink, k8bHnswIndexSink, k8cIncrementalIndexSink,
    k8dHnswIncrementalSink, k8cStandingBuild, k8cAppendSearch,
    k8dAppendSearch, k14IndexErasure,
    k9PartitionOverwrite,
    k10WriteAuditPublish, k11TargetedDelete, k12TimeTravel,
    k13MergeUpsert, k15Vacuum, k16ExpireSnapshots,
    k17PartitionEvolution,
    e1IngestIncremental,
    e2ActivitiesSnapshot, e3StreamsPipeline, p4JsonFlatten, p4bAzmFlatten,
    p9NormalizeFull, s5CatalogArgmax, s6ExistsProbe, f5ExactKey,
    s2RestSource, s2bHeart1sec, s2cThirtyDay, f6MissingDates,
    f8ResourceValidation, s2dRetry429, s2eTokenRefresh, s9JsonlSource,
    s10SnapshotDiff, s11GenerationUnion, s12CsvSource, s13BinarySource)
}
