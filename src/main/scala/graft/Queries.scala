package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Central registry wiring SURVEY.md §2 operators to named queries over the
  * driver testdata, each with (where SQL-expressible) a DuckDB oracle.
  *
  * Conventions for oracle parity (SURVEY.md §5.1, §7.4):
  *   - every computed column aliased identically in Spark and SQL;
  *   - double aggregations wrapped in round(_, k) on BOTH sides so
  *     accumulation-order ulp noise can't flip the hash;
  *   - integer-ish derivations cast to BIGINT on both sides (DuckDB's
  *     year()/length() return BIGINT, Spark's return INT);
  *   - any top-k / argmax carries a deterministic tie-break.
  */
object Queries {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  import Tables._

  // ---------------------------------------------------------------------
  // Flagship (E3 restatement): date-filter → join → derived aggregates.
  // Exercises S1, F1/F2, J1, §2.6 derived aggs in one plan.
  // orders is the small side per customer → but both sides are fact-sized
  // here; Catalyst/AQE picks the join. Revenue rounded for oracle parity.
  // Ref: get_stream_data.py:64-86 + utils.py per-activity aggregates intent.
  // ---------------------------------------------------------------------
  val q1Flagship = Q(
    "q1_flagship",
    (s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-01-01") &&
          col("o_orderdate") <= lit("2000-12-31"))
        .select("o_orderkey", "o_custkey")
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_items"),
          // exact decimal accumulation → cast double: immune to
          // partition-order ulp noise that round(double_sum, 2) is not
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          sum(col("l_quantity")).as("sum_qty"),
          max(col("l_shipdate")).as("last_ship"))
    },
    Some("""SELECT o_custkey, count(*) AS n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      sum(l_quantity) AS sum_qty, max(l_shipdate) AS last_ship
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        AND o_orderdate <= TIMESTAMP '2000-12-31'
      GROUP BY o_custkey"""))

  // S1: parquet scan with projection + predicate — both must push to the
  // scan (PushedFilters / ReadSchema in .explain). Ref: get_stream_data.py:64.
  val s1Scan = Q(
    "s1_scan_prune",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-06-01"))
        .select("l_orderkey", "l_partkey", "l_quantity"),
    Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-06-01'"""))

  // S7: row generator — date sequence (descending processing order, O1).
  // Ref: fitbit_utils.py:211-212.
  val s7DateSeq = Q(
    "s7_date_sequence",
    (s, _) =>
      s.sql("""SELECT explode(sequence(to_date('2024-01-01'),
                 to_date('2024-03-01'), interval 1 day)) AS d""")
        .orderBy(col("d").desc),
    Some("""SELECT CAST(generate_series AS DATE) AS d
      FROM generate_series(DATE '2024-01-01', DATE '2024-03-01',
                           INTERVAL 1 DAY) ORDER BY d DESC"""))

  // P1/P2: derive date/time-of-day strings from the event timestamp, then
  // rebuild the timestamp from them (the reference's row-lambda as
  // codegen'd built-ins). Ref: fitbit_utils.py:381-387.
  val p1Derive = Q(
    "p1_derive_timestamp",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("date"),
          date_format(col("ts"), "HH:mm:ss").as("time"))
        .withColumn("datetime",
          to_timestamp(concat_ws(" ", col("date"), col("time")))),
    Some("""SELECT event_id, date, time,
      strptime(date || ' ' || time, '%Y-%m-%d %H:%M:%S') AS datetime
      FROM (SELECT event_id, strftime(ts, '%Y-%m-%d') AS date,
                   strftime(ts, '%H:%M:%S') AS time FROM events) t"""))

  // P5: JSON field extraction from a raw JSON string column — both the
  // path-pluck form (get_json_object) and the declared-schema form
  // (from_json: one parse per row even if many fields are read).
  // NOTE: from_json('k BIGINT') nulls out a QUOTED numeric ("k":"7"),
  // while the oracle's json_extract_string+CAST would parse it — parity
  // holds because testdata always encodes k as a JSON number (ADVICE r2).
  // Ref: fitbit_utils.py:273-276 (nested .get path into response JSON).
  val p5Json = Q(
    "p5_json_extract",
    (s, d) =>
      events(s, d).select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k_typed")),
    Some("""SELECT event_id, event_type,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
      FROM events"""))

  // F1/F2: date lower+upper bound filters. Ref: get_stream_data.py:68-75.
  val f1f2Filter = Q(
    "f1f2_date_filter",
    (s, d) =>
      orders(s, d).filter(
        to_date(col("o_orderdate")) >= lit("1999-01-01") &&
          to_date(col("o_orderdate")) <= lit("1999-12-31")),
    Some("""SELECT * FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
        AND CAST(o_orderdate AS DATE) <= DATE '1999-12-31'"""))

  // J1: inner equi-join enriching fact rows with metadata — the
  // commented-out merge in the reference. Both sides are fact-sized
  // (orders grows with SF), so NO broadcast hint: AQE picks the strategy
  // (shuffle/sort-merge at scale, broadcast only if a side is actually
  // small at runtime). Forcing broadcast here was round-1's one scale
  // killer (VERDICT r1 §What's wrong 1). Ref: get_stream_data.py:81-86.
  val j1Join = Q(
    "j1_join_enrich",
    (s, d) => {
      val o = orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "o_custkey", "o_orderdate", "o_orderpriority")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
      o_custkey, o_orderdate, o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""))

  // J1b: broadcast-hash join where broadcast is actually right — nation
  // and region are bounded dimension tables (25 / 5 rows at every SF), so
  // the hint is safe at any scale and removes two shuffles.
  // Ref: get_stream_data.py:81-86 (join-enrich intent, dimension side).
  val j1bBroadcastDim = Q(
    "j1b_broadcast_dim",
    (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name"),
    Some("""SELECT c_custkey, c_name, n_name, r_name
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey"""))

  // J2: left anti-join — the reference's imperative "skip if already
  // present" incremental-load check. Ref: fitbit_utils.py:213-232.
  val j2Anti = Q(
    "j2_anti_join",
    (s, d) => {
      val recent = orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
      customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2001-01-01')"""))

  // J3: left semi-join — cached keys matched back to requested ids.
  // Ref: utils.py:411-417 (intended semantics, §2.12.3).
  val j3Semi = Q(
    "j3_semi_join",
    (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  // A1/O2: argmax — latest record per key, deterministic tie-break.
  // Ref: get_stream_data.py:56-62 (argmax over snapshot dates).
  val a1Argmax = Q(
    "a1_argmax_latest",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").as("latest_date"))
    },
    Some("""SELECT o_custkey, o_orderkey AS latest_orderkey,
      o_orderdate AS latest_date
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
      WHERE rn = 1"""))

  // A1b: argmax as a TRUE hash aggregate — the obvious max(struct(date,
  // key)) silently degrades to SortAggregate (struct buffers aren't
  // hash-aggregable: two per-partition sorts sneak back in), so the
  // (date, key) pair is packed into one long — days-since-epoch in the
  // high bits, key in the low 40 — whose max IS codegen'd HashAggregate:
  // one shuffle, zero sorts, same lexicographic argmax as the window
  // form in a1. Ref: get_stream_data.py:56-62; SURVEY §7.2.
  val a1bArgmaxMaxBy = Q(
    "a1b_argmax_maxby",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(expr(
          "unix_date(to_date(o_orderdate)) * 1099511627776L + o_orderkey"))
          .as("pk"))
        .select(col("o_custkey"),
          expr("pk % 1099511627776L").as("latest_orderkey"),
          expr("date_add(DATE '1970-01-01', " +
            "CAST(pk div 1099511627776L AS INT))").as("latest_date")),
    Some("""SELECT o_custkey, o_orderkey AS latest_orderkey,
      CAST(o_orderdate AS DATE) AS latest_date
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
      WHERE rn = 1"""))

  // A3: distinct key dedup. Ref: get_stream_data.py:76.
  val a3Distinct = Q(
    "a3_distinct",
    (s, d) => orders(s, d).select("o_custkey").distinct(),
    Some("SELECT DISTINCT o_custkey FROM orders"))

  // A2/A4 + §2.6 "consumed-not-computed" aggregates: the full agg battery
  // the upstream API computed for the reference (avg/max/min/counts).
  val aggBattery = Q(
    "agg_battery",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_disc"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  // O2: top-1 by derived key (TakeOrderedAndProject), deterministic.
  // Ref: get_stream_data.py:56-62.
  val o2Top1 = Q(
    "o2_top1",
    (s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1"""))

  // U1 + P8: union with schema alignment (missing columns null-filled).
  // Ref: utils.py:358-370,423-425.
  val u1Union = Q(
    "u1_union_align",
    (s, d) => {
      val a = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01"))
        .select(col("l_orderkey").as("okey"), col("l_quantity").as("qty"))
      val b = orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_orderkey").as("okey"),
          col("o_totalprice").as("price"))
      a.unionByName(b, allowMissingColumns = true)
    },
    Some("""SELECT l_orderkey AS okey, l_quantity AS qty FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-01-01'
      UNION ALL BY NAME
      SELECT o_orderkey AS okey, o_totalprice AS price FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01'"""))

  // §2.9 scalar battery: date/string/math functions over one projection.
  val scalarBattery = Q(
    "scalar_battery",
    (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_add(to_date(col("o_orderdate")), 30).as("d30"),
        unix_timestamp(col("o_orderdate")).as("epoch"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        split(col("o_orderpriority"), "-").getItem(1).as("prio_word"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
          .as("status_prio"),
        round(col("o_totalprice") / 7.0, 3).as("price_div"),
        col("o_orderpriority").contains("URGENT").as("is_urgent"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)-", 1)
          .as("prio_num")),
    Some("""SELECT o_orderkey,
      year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      day(o_orderdate) AS dom,
      CAST(o_orderdate AS DATE) + 30 AS d30,
      CAST(epoch(o_orderdate) AS BIGINT) AS epoch,
      upper(o_orderpriority) AS prio_upper,
      substring(o_orderpriority, 1, 1) AS prio_code,
      CAST(length(o_orderstatus) AS BIGINT) AS status_len,
      string_split(o_orderpriority, '-')[2] AS prio_word,
      o_orderstatus || '|' || o_orderpriority AS status_prio,
      round(o_totalprice / 7.0, 3) AS price_div,
      contains(o_orderpriority, 'URGENT') AS is_urgent,
      regexp_extract(o_orderpriority, '^(\d+)-', 1) AS prio_num
      FROM orders"""))

  // S8: year-range → epoch bounds — the pushed-down time predicate the
  // reference encodes into its paginated scan URL (utils.py:55-59).
  // Pure literals: Catalyst constant-folds the whole row at plan time.
  val s8EpochBounds = Q(
    "s8_epoch_bounds",
    (s, _) =>
      s.sql("""SELECT CAST(unix_timestamp(make_date(2017, 1, 1)) AS BIGINT)
          AS after_epoch,
        CAST(unix_timestamp(make_date(2026, 1, 1)) AS BIGINT)
          AS before_epoch"""),
    Some("""SELECT CAST(epoch(DATE '2017-01-01') AS BIGINT) AS after_epoch,
      CAST(epoch(DATE '2026-01-01') AS BIGINT) AS before_epoch"""))

  // F7: the commented-out length+year filter (get_activity_data.py:25) —
  // both predicates evaluated post-scan, year() derivable from the
  // pushed-down date column.
  val f7LengthYear = Q(
    "f7_length_year",
    (s, d) =>
      orders(s, d)
        .filter(length(col("o_orderpriority")) > 7 &&
          year(col("o_orderdate")) === 1999)
        .select("o_orderkey", "o_orderpriority"),
    Some("""SELECT o_orderkey, o_orderpriority FROM orders
      WHERE length(o_orderpriority) > 7 AND year(o_orderdate) = 1999"""))

  // F3/A4: empty-input guard as a relational op — count-emptiness of a
  // filtered slice (the reference's `len(dataset) == 0` skip,
  // fitbit_utils.py:270-277). In Spark an empty slice is a natural
  // no-op downstream; the guard itself is just an aggregate.
  val f3a4EmptyGuard = Q(
    "f3a4_empty_guard",
    (s, d) =>
      events(s, d)
        .filter(col("event_type") === lit("no_such_resource"))
        .agg(count(lit(1)).as("n"))
        .select(col("n"), (col("n") === 0).as("is_empty")),
    Some("""SELECT count(*) AS n, count(*) = 0 AS is_empty
      FROM events WHERE event_type = 'no_such_resource'"""))

  // K4/J2: incremental-load planning — (day × resource) work-list minus
  // already-materialized partitions, as a distributed anti-join instead of
  // the reference's driver-side membership loop. Ref: fitbit_utils.py:213-232.
  val k4Incremental = Q(
    "k4_incremental_antijoin",
    (s, d) => {
      val days = s.sql("""SELECT explode(sequence(to_date('2024-01-01'),
        to_date('2024-02-15'), interval 1 day)) AS day""")
      val types = events(s, d).select(col("event_type")).distinct()
      val existing = events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type")).distinct()
      days.crossJoin(types)
        .join(existing, Seq("day", "event_type"), "left_anti")
    },
    Some("""WITH days AS (SELECT CAST(generate_series AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-02-15',
                             INTERVAL 1 DAY)),
      types AS (SELECT DISTINCT event_type FROM events),
      existing AS (SELECT DISTINCT CAST(ts AS DATE) AS day, event_type
                   FROM events)
      SELECT w.day, w.event_type
      FROM (SELECT * FROM days CROSS JOIN types) w
      WHERE NOT EXISTS (SELECT 1 FROM existing e
        WHERE e.day = w.day AND e.event_type = w.event_type)"""))

  // P9/P10: wide normalization with defaults + conditional-null projection
  // (CASE WHEN keeps a column only under a flag). Ref: utils.py:146-233.
  val p9Normalize = Q(
    "p9_normalize_defaults",
    (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        when(col("n_chars") > 200, col("text")).otherwise(lit(null))
          .as("long_text"),
        coalesce(length(col("text")), lit(0)).cast("long").as("text_len")),
    Some("""SELECT doc_id,
      coalesce(lang, 'und') AS lang,
      coalesce(source, 'unknown') AS source,
      CASE WHEN n_chars > 200 THEN text ELSE NULL END AS long_text,
      CAST(coalesce(length(text), 0) AS BIGINT) AS text_len
      FROM documents"""))

  // P6/P7: array element extraction + null-array defaults — the latlng
  // split (element 1/2 → lat/lon) with deterministic synthesized nulls
  // exercising the coalesce default path. Per-row projection, codegen'd.
  // Ref: utils.py:358-363.
  val p6p7ArrayExtract = Q(
    "p6p7_array_extract",
    (s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("lat"),
        element_at(col("embedding"), 2).cast("double").as("lon"),
        coalesce(
          when(col("label") === 0, lit(null))
            .otherwise(element_at(col("embedding"), 3)).cast("double"),
          lit(0.0)).as("alt_default"),
        size(col("embedding")).cast("long").as("dim")),
    Some("""SELECT vec_id,
      CAST(embedding[1] AS DOUBLE) AS lat,
      CAST(embedding[2] AS DOUBLE) AS lon,
      coalesce(CAST(CASE WHEN label = 0 THEN NULL ELSE embedding[3] END
                    AS DOUBLE), 0.0) AS alt_default,
      CAST(len(embedding) AS BIGINT) AS dim
      FROM embeddings"""))

  // P11: pivot parallel arrays → long form via arrays_zip + posexplode —
  // the reference's stream-pivot in reverse-composable form (same-length
  // parallel arrays walked positionally). Ref: utils.py:352-357.
  val p11ArrayPivot = Q(
    "p11_array_pivot",
    (s, d) =>
      embeddings(s, d)
        .select(col("vec_id"),
          expr("slice(embedding, 1, 4)").as("a"),
          expr("slice(embedding, 5, 4)").as("b"))
        .select(col("vec_id"),
          posexplode(arrays_zip(col("a"), col("b"))))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col.a").cast("double").as("va"),
          col("col.b").cast("double").as("vb")),
    Some("""SELECT vec_id, CAST(k AS BIGINT) AS pos,
      CAST(embedding[k+1] AS DOUBLE) AS va,
      CAST(embedding[k+5] AS DOUBLE) AS vb
      FROM embeddings CROSS JOIN (VALUES (0), (1), (2), (3)) t(k)"""))

  // P11b: pivot from the reference's ACTUAL raw shape — a list of
  // {type, data} stream records → one column per stream type
  // (utils.py:352-357: `{s["type"]: s["data"] for s in streams}`).
  // Spark-first: map_from_entries turns the struct array into a map in
  // one codegen'd expression, then per-type lookups project the columns —
  // no explode/groupBy/pivot shuffle; a pure per-row projection at any
  // scale. The struct array is synthesized inline from embeddings so the
  // oracle is the flat relational answer. (VERDICT r3 next-round item 5.)
  val p11bRawStreamPivot = Q(
    "p11b_raw_stream_pivot",
    (s, d) =>
      embeddings(s, d)
        .select(col("vec_id"), array(
          struct(lit("latlng").as("type"),
            element_at(col("embedding"), 1).cast("double").as("data")),
          struct(lit("velocity_smooth").as("type"),
            element_at(col("embedding"), 2).cast("double").as("data")),
          struct(lit("altitude").as("type"),
            element_at(col("embedding"), 3).cast("double").as("data")))
          .as("streams"))
        .select(col("vec_id"), map_from_entries(col("streams")).as("m"))
        .select(col("vec_id"),
          col("m")("latlng").as("latlng"),
          col("m")("velocity_smooth").as("velocity_smooth"),
          col("m")("altitude").as("altitude")),
    Some("""SELECT vec_id,
      CAST(embedding[1] AS DOUBLE) AS latlng,
      CAST(embedding[2] AS DOUBLE) AS velocity_smooth,
      CAST(embedding[3] AS DOUBLE) AS altitude
      FROM embeddings"""))

  /** All registered queries, in registration order. */
  def all: Seq[Q] = Seq(
    q1Flagship, s1Scan, s7DateSeq, p1Derive, p5Json, f1f2Filter,
    j1Join, j1bBroadcastDim, j2Anti, j3Semi, a1Argmax, a1bArgmaxMaxBy,
    a3Distinct, aggBattery, o2Top1, u1Union, scalarBattery,
    s8EpochBounds, f7LengthYear, f3a4EmptyGuard, k4Incremental,
    p9Normalize, p6p7ArrayExtract, p11ArrayPivot, p11bRawStreamPivot)
}
